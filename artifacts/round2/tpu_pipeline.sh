#!/bin/bash
# One serial TPU pipeline (single-tenant chip): wait for the backend, then
# NOTE: no `timeout` on chip-touching processes — killing a TPU client
# mid-compile wedges the chip claim (CLAUDE.md rule 1).
# run the bench and the staged perf experiments, logging everything.
LOG=/root/repo/artifacts/round2/tpu_pipeline.log
cd /root/repo
while true; do
  echo "=== probe $(date) ===" >> $LOG
  python -u - >> $LOG 2>&1 <<'PY'
import time, jax
t0=time.time()
d = jax.devices()
print(f"DEVICES {d} after {time.time()-t0:.1f}s", flush=True)
import jax.numpy as jnp
(jnp.ones((256,256), jnp.bfloat16) @ jnp.ones((256,256), jnp.bfloat16)).block_until_ready()
print("TPU_OK", flush=True)
PY
  if tail -5 $LOG | grep -q TPU_OK; then break; fi
  sleep 600
done
echo "=== TPU live; running bench $(date) ===" >> $LOG
python -u bench.py > /root/repo/artifacts/round2/BENCH_TPU.json 2>> $LOG
echo "=== bench rc=$? ===" >> $LOG
cat /root/repo/artifacts/round2/BENCH_TPU.json >> $LOG
echo "=== perf experiments $(date) ===" >> $LOG
python -u artifacts/round2/tpu_perf_experiments.py >> $LOG 2>&1
echo "=== pipeline done rc=$? $(date) ===" >> $LOG
