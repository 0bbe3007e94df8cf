#!/bin/bash
for i in $(seq 1 200); do
  if timeout 90 env PYTHONPATH=/root/.axon_site python -c "import jax; jax.devices()" 2>/dev/null; then
    echo "TPU BACK at $(date); starting queue" > /root/repo/.scratch/tpu_status
    cd /root/repo
    PYTHONPATH=/root/repo:/root/.axon_site python -u .scratch/tpu_queue.py \
      > /root/repo/.scratch/tpu_queue.log 2>&1
    echo "QUEUE DONE rc=$? at $(date)" >> /root/repo/.scratch/tpu_status
    exit 0
  fi
  echo "probe $i failed $(date)" > /root/repo/.scratch/tpu_status
  sleep 120
done
