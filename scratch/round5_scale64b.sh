#!/bin/sh
# Round-5 scale64 v2: the original 64-id run converged to the degenerate
# near-plane curtain by step 14k (all rays depth 8.0/acc 1.0 — see
# CLAUDE.md round-5 session 2). Restart from scratch with near/far
# tightened to the orbit geometry (11/21) so the shortcut has no
# unconstrained space, train to the 22:15 deadline, then eval + scaling
# refresh + bench warm.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

SUP_DEADLINE=1787177700 \
  sh scratch/supervise_train.sh morphable64 studydata/faces64 64 40000 \
  --near 11.0 --far 21.0 > /tmp/r5_sup_m64b.out 2>&1
echo "TRAIN64_EXIT=$?"
timeout 5400 python -u examples/morphable_flagship.py --stage eval \
  --data studydata/faces64 --n_ids 64 --expname morphable64 --white_bkgd \
  --near 11.0 --far 21.0 --exp_matrix_ids 2 \
  --out_json artifacts/morphable64.json > /tmp/r5_eval64.out 2>&1
echo "EVAL64_EXIT=$?"
python -u examples/morphable_scaling.py > /tmp/r5_scaling64.out 2>&1
echo "SCALING_EXIT=$?"
timeout 1200 python -u bench.py > /tmp/r5_bench_warm3.out 2>&1
echo "BENCH3_EXIT=$?"
echo "SCALE64B COMPLETE $(date)"
