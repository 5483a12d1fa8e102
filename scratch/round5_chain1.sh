#!/bin/sh
# Round-5 chain, stage 1: restore the flagship proof chain (VERDICT r5 #2).
# ONE TPU process at a time; host stays idle per CLAUDE.md.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# A: resume the flagship 10k -> 40k (supervisor handles axon wedges)
sh scratch/supervise_train.sh morphable_flagship studydata/faces8 8 40000 \
  > /tmp/r5_sup_flagship.out 2>&1
echo "TRAIN_EXIT=$?"

# B: re-measure fitting with the SO(3) pose retraction actually exercised
timeout 7200 python -u examples/fit_quality.py \
  --data studydata/faces8 --n_ids 8 --expname morphable_flagship \
  --white_bkgd > /tmp/r5_fit.out 2>&1
echo "FIT_EXIT=$?"

# C: refresh the serving artifact from the same checkpoint
timeout 10800 python -u examples/serve_flagship.py \
  --data studydata/faces8 --n_ids 8 --expname morphable_flagship \
  --white_bkgd > /tmp/r5_serve.out 2>&1
echo "SERVE_EXIT=$?"

# D: flagship eval artifact refresh (held-out PSNR/SSIM at 40k)
timeout 7200 python -u examples/morphable_flagship.py --stage eval \
  --data studydata/faces8 --n_ids 8 --expname morphable_flagship \
  --white_bkgd --out_json artifacts/morphable_flagship.json \
  > /tmp/r5_eval8.out 2>&1
echo "EVAL_EXIT=$?"

echo "CHAIN1 COMPLETE"
