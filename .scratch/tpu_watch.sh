#!/bin/bash
for i in $(seq 1 120); do
  if timeout 60 env PYTHONPATH=/root/.axon_site python -c "import jax; jax.devices()" 2>/dev/null; then
    echo "TPU BACK at $(date)" > /root/repo/.scratch/tpu_status
    exit 0
  fi
  echo "probe $i failed $(date)" > /root/repo/.scratch/tpu_status
  sleep 120
done
exit 1
