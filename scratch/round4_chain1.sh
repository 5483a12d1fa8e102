#!/bin/sh
# Round-4 chain, stage 1: the 16-identity scale-up (VERDICT r3 #3).
# ONE TPU process; host stays idle per CLAUDE.md round-3 note.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 14400 python -u examples/morphable_flagship.py --stage train \
  --data studydata/faces16 --n_ids 16 --expname morphable16 \
  --iters 40000 --white_bkgd --device_data \
  > /tmp/r4_train16.out 2>&1
echo "TRAIN_EXIT=$?"

timeout 7200 python -u examples/morphable_flagship.py --stage eval \
  --data studydata/faces16 --n_ids 16 --expname morphable16 --white_bkgd \
  --exp_matrix_ids 2 \
  --out_json artifacts/morphable16.json \
  > /tmp/r4_eval16.out 2>&1
echo "EVAL_EXIT=$?"

echo "CHAIN1 COMPLETE"
