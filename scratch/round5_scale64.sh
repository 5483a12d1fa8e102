#!/bin/sh
# Round-5 post-tail orchestrator, priority-ordered for the remaining
# wall-clock (all stages hard-capped so the TPU is idle before the
# driver's round-end bench.py — round-4 lesson):
#   A. 256^2 multi-identity TRAINING (VERDICT r4 weak #6: device_data has
#      never been used at 256^2+ on a multi-identity corpus). Fine-tune
#      morphable32 10k iters on the faces32hi 256^2 set (checkpoint-copy
#      warm start, the master's stage-5 precedent) + held-out eval at
#      256^2 -> artifacts/morphable32hi.json.
#   B. 4th identity-scaling point (64 ids) toward the reference's 300
#      (configs/exp_mofanerf.txt:6), 40k iters = 625/id, deadline-capped;
#      eval runs from the last checkpoint either way.
#   C. scaling table refresh + a final bench warm (per-server compile
#      caches — warming = repetition).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

T=$(cat /tmp/tail.pid)
while kill -0 "$T" 2>/dev/null; do sleep 60; done
echo "TAIL_DONE $(date)"

# --- A: 256^2 fine-tune (1h cap) + eval ---
mkdir -p studydata/logs/morphable32hi
if [ ! -d studydata/logs/morphable32hi/checkpoints ]; then
  cp -r studydata/logs/morphable32/checkpoints studydata/logs/morphable32hi/
fi
SUP_DEADLINE=$(( $(date +%s) + 3600 )) \
  sh scratch/supervise_train.sh morphable32hi studydata/faces32hi 32 50000 \
  > /tmp/r5_sup_m32hi.out 2>&1
echo "TRAIN32HI_EXIT=$?"
timeout 3600 python -u examples/morphable_flagship.py --stage eval \
  --data studydata/faces32hi --n_ids 32 --expname morphable32hi \
  --white_bkgd --out_json artifacts/morphable32hi.json \
  > /tmp/r5_eval32hi.out 2>&1
echo "EVAL32HI_EXIT=$?"

# --- B: 64-id scale point, stops at 22:15 UTC regardless ---
if [ ! -f studydata/faces64/factors_id.npy ]; then
  timeout 3600 python -u scratch/gen_round5.py --sets faces64 \
    > /tmp/r5_gen64.out 2>&1
  echo "GEN64_EXIT=$?"
fi
SUP_DEADLINE=$(date -d '22:15' +%s) \
  sh scratch/supervise_train.sh morphable64 studydata/faces64 64 40000 \
  > /tmp/r5_sup_m64.out 2>&1
echo "TRAIN64_EXIT=$?"
timeout 5400 python -u examples/morphable_flagship.py --stage eval \
  --data studydata/faces64 --n_ids 64 --expname morphable64 --white_bkgd \
  --exp_matrix_ids 2 --out_json artifacts/morphable64.json \
  > /tmp/r5_eval64.out 2>&1
echo "EVAL64_EXIT=$?"

# --- C: refresh the scaling table + leave the bench shapes warm ---
python -u examples/morphable_scaling.py > /tmp/r5_scaling64.out 2>&1
echo "SCALING_EXIT=$?"
timeout 1200 python -u bench.py > /tmp/r5_bench_warm3.out 2>&1
echo "BENCH3_EXIT=$?"
echo "SCALE64 COMPLETE $(date)"
