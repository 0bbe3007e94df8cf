cd /root/repo
TESTS_ON_TPU=1 PYTHONPATH=/root/repo:/root/.axon_site python -u -m pytest tests/test_tpu_hardware.py::test_mesh1_fused_update_matches_unmeshed_on_tpu -q -x 2>&1
