#!/bin/sh
# Round-5 chain, stage 2: datasets (CPU-only; run while the TPU is idle),
# then the 32-identity scale-up train + eval (VERDICT r5 #4).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 7200 python -u scratch/gen_round5.py > /tmp/r5_gen.out 2>&1
echo "GEN_EXIT=$?"

# 32-id morphable training (supervisor handles axon wedges)
sh scratch/supervise_train.sh morphable32 studydata/faces32 32 50000 \
  > /tmp/r5_sup_m32.out 2>&1
echo "TRAIN32_EXIT=$?"

timeout 10800 python -u examples/morphable_flagship.py --stage eval \
  --data studydata/faces32 --n_ids 32 --expname morphable32 --white_bkgd \
  --exp_matrix_ids 2 --out_json artifacts/morphable32.json \
  > /tmp/r5_eval32.out 2>&1
echo "EVAL32_EXIT=$?"

echo "CHAIN2 COMPLETE"
