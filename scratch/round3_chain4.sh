#!/bin/sh
# Round-3 chain v4 (launch manually after chain3 + result review):
# scale the morphable study to 16 identities x 4 expressions.
set -x
cd /root/repo

# 1. dataset (host CPU — run only with the TPU idle)
timeout 3600 python scratch/gen_faces16.py > /tmp/gen_faces16.out 2>&1
echo "GEN_EXIT=$?"

# 2. train ONE flagship model over 16 ids x 4 expressions
timeout 14400 python -u examples/morphable_flagship.py --stage train \
  --data studydata/faces16 --n_ids 16 --expname morphable16 \
  --iters 40000 --white_bkgd --device_data \
  > /tmp/chain4_train.out 2>&1
echo "TRAIN_EXIT=$?"

# 3. evaluate: held-out per-identity PSNR/SSIM, leakage, interpolation,
#    expression control
timeout 5400 python examples/morphable_flagship.py --stage eval \
  --data studydata/faces16 --n_ids 16 --expname morphable16 --white_bkgd \
  --out_json artifacts/morphable16.json \
  > /tmp/chain4_eval.out 2>&1
echo "EVAL_EXIT=$?"

echo "CHAIN4 COMPLETE"
