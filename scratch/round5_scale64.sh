#!/bin/sh
# Round-5 bonus: 4th identity-scaling point (64 ids) toward the reference's
# 300 (configs/exp_mofanerf.txt:6). Runs strictly AFTER the round-5 tail
# releases the TPU + host. faces64 is generated earlier at nice 19 (the
# master's stage-3 precedent: one niced datagen coexists with TPU work).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

T=$(cat /tmp/tail.pid)
while kill -0 "$T" 2>/dev/null; do sleep 60; done
echo "TAIL_DONE $(date)"

# datagen safety net if the niced early run didn't finish
if [ ! -f studydata/faces64/factors_id.npy ]; then
  timeout 3600 python -u scratch/gen_round5.py --sets faces64 \
    > /tmp/r5_gen64.out 2>&1
  echo "GEN64_EXIT=$?"
fi

# 40k iters = 625/id: the iso-total-budget point (the scaling table's
# iters_per_identity column is the honest cost axis). Hard wall-clock
# deadline at 22:15 UTC so the TPU is idle well before the driver's
# round-end bench.py (round-4 lesson: a live train alongside bench = no
# perf number). Eval runs from the last checkpoint either way.
SUP_DEADLINE=$(date -d '22:15' +%s) \
  sh scratch/supervise_train.sh morphable64 studydata/faces64 64 40000 \
  > /tmp/r5_sup_m64.out 2>&1
echo "TRAIN64_EXIT=$?"

timeout 5400 python -u examples/morphable_flagship.py --stage eval \
  --data studydata/faces64 --n_ids 64 --expname morphable64 --white_bkgd \
  --exp_matrix_ids 2 --out_json artifacts/morphable64.json \
  > /tmp/r5_eval64.out 2>&1
echo "EVAL64_EXIT=$?"
python -u examples/morphable_scaling.py > /tmp/r5_scaling64.out 2>&1
echo "SCALING_EXIT=$?"

# leave the chip warm on the bench shapes (per-server compile caches)
timeout 1200 python -u bench.py > /tmp/r5_bench_warm3.out 2>&1
echo "BENCH3_EXIT=$?"
echo "SCALE64 COMPLETE $(date)"
