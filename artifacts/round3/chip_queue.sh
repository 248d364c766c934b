#!/bin/bash
# Sequential TPU job queue for round 3 (single-tenant chip: one process
# at a time).  Waits for the in-flight autoscale run, then runs the
# remaining chip jobs back to back, each detach-safe with its own log.
set -u
cd /root/repo
D=artifacts/round3

wait_pid() {
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
}

if [ -n "${WAIT_PID:-}" ]; then
  echo "[queue] waiting for pid $WAIT_PID (autoscale run #1)..."
  wait_pid "$WAIT_PID"
fi

echo "[queue] curve run seed 31 starting $(date)"
python -u $D/tpu_tag_continuous_train_exact.py full 100 31 \
  > $D/tpu_tagc_exact_seed31.log 2>&1
echo "[queue] curve run seed 32 starting $(date)"
python -u $D/tpu_tag_continuous_train_exact.py full 100 32 \
  > $D/tpu_tagc_exact_seed32.log 2>&1

echo "[queue] reference-checkpoint cross-eval starting $(date)"
python -u $D/ref_ckpt_eval.py \
  /root/repo/artifacts/round3/tag_continuous_tpu_exact \
  > $D/ref_ckpt_eval.log 2>&1

echo "[queue] autoscale run #2 (extended knob ladder) starting $(date)"
WD_PROBE_TIMEOUT_S=900 python -u -m warpdrive_tpu.training.scripts.train \
  -e tag_continuous -a --results_dir $D/autoscale_run2 \
  > $D/autoscale_tag_continuous2.log 2>&1

echo "[queue] full bench starting $(date)"
python -u bench.py > $D/bench_r3_validation.json 2> $D/bench_r3_validation.log

echo "[queue] all done $(date)"
