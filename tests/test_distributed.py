"""Real two-process exercise of parallel/distributed.initialize_distributed.

Round-2 verdict item #5: this was the only §5 subsystem whose code had never
executed under test.  Here two CPU subprocesses form an actual
``jax.distributed`` cluster (Gloo collectives), assert
``jax.process_count() == 2``, and run a cross-process shard_map psum whose
result must equal the sum of both processes' local contributions.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from gsmvi_tpu.parallel.distributed import initialize_distributed

    pid, port = int(sys.argv[1]), sys.argv[2]
    ok = initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                                num_processes=2, process_id=pid)
    assert ok is True, ok
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2 * jax.local_device_count()

    # Idempotence: a second call is a no-op that still reports distributed.
    assert initialize_distributed(auto=True) is True

    # Cross-process psum: each process contributes (pid + 1); the reduction
    # must see both, i.e. equal 3 on every process.
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("d",))
    n_local = jax.local_device_count()
    local = jnp.full((n_local,), float(pid + 1), jnp.float32)
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("d"))
    out = jax.jit(shard_map(lambda x: jax.lax.psum(jnp.sum(x), "d"),
                            mesh=mesh, in_specs=P("d"), out_specs=P()))(garr)
    # out_specs=P() replicates the reduction: every process's local shard
    # holds the full cross-process sum.
    total = float(np.asarray(out.addressable_data(0)))
    expect = float(n_local * (1 + 2))
    assert total == expect, (total, expect)
    print(f"proc {pid} OK total={total}", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _child_env():
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_two_process_cluster_psum(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(_CHILD)
    port = _free_port()
    env = _child_env()
    procs = [subprocess.Popen([sys.executable, str(child), str(i), str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"process {i} timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out


def test_explicit_misconfiguration_raises():
    """Explicit-argument failures must raise, not silently fall back to
    single-process (distributed.py failure-semantics contract).  An
    inconsistent argument set errors before any RPC (an unreachable
    coordinator instead hard-aborts the process inside the distributed
    client, so the wrapper never gets a chance to swallow anything).  Run
    in a subprocess: jax.distributed state is process-global."""
    code = textwrap.dedent("""
        import jax
        jax.config.update("jax_platforms", "cpu")
        from gsmvi_tpu.parallel.distributed import initialize_distributed
        try:
            # Falsy-but-explicit: coordinator_address="" (missing env var)
            # must reach initialize and raise, not silently fall back.
            initialize_distributed(coordinator_address="", num_processes=2,
                                   process_id=0)
        except Exception:
            print("RAISED", flush=True)
        else:
            print("SILENT", flush=True)
    """)
    out = subprocess.run([sys.executable, "-c", code], env=_child_env(),
                         capture_output=True, text=True, timeout=120)
    assert "RAISED" in out.stdout, out.stdout + out.stderr


def test_no_arguments_returns_false():
    from gsmvi_tpu.parallel.distributed import initialize_distributed

    # In-process call: nothing requested -> False, and must NOT initialize.
    assert initialize_distributed() is False
