#!/bin/sh
# Round-5 final chain: runs after round5_scale64.sh releases the TPU.
#   1. Expression-identifiability fine-tune (VERDICT r4 #5): resume
#      morphable16x20r5 from 60k with ray_bias=expdelta (rays concentrated
#      on expression-informative pixels - data/device_data.py) for 20k
#      iters, deadline-capped at 75 min.
#   2. Decisive measurement: the full 20x20 expression-transfer matrix
#      (examples/expression_matrix.py) -> artifacts/expression_matrix.json.
#   3. Clean 256^2 refine corpus from the FIXED occupancy path (proposal
#      grid + dilation + band respacing) on the morphable32 checkpoint,
#      fresh corpus dir, then the GAN study -> artifacts/refine_nerf_256.json.
#   4. Bench warm + fast pytest while the TPU is idle (round-end hygiene).
# Every stage is hard-capped so the TPU is idle before the driver's
# round-end bench.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

S=29396  # round5_scale64.sh pid
while kill -0 "$S" 2>/dev/null; do sleep 60; done
echo "SCALE64_DONE $(date)"

# --- 1. expdelta fine-tune 60k -> 80k ---
SUP_DEADLINE=$(( $(date +%s) + 4500 )) \
  sh scratch/supervise_train.sh morphable16x20r5 studydata/faces16x20 16 80000 \
  --ray_bias expdelta > /tmp/r5_sup_expdelta.out 2>&1
echo "EXPDELTA_TRAIN_EXIT=$?"

# --- 2. expression matrix ---
timeout 3600 python -u examples/expression_matrix.py \
  --data studydata/faces16x20 --expname morphable16x20r5 --n_ids 16 \
  --ids 2 --poses 2 --out_json artifacts/expression_matrix.json \
  > /tmp/r5_expmatrix.out 2>&1
echo "EXPMATRIX_EXIT=$?"

# --- 3. clean 256^2 corpus + GAN on the fixed fast path ---
timeout 9000 python -u examples/refine_nerf_corpus.py \
  --data studydata/faces32hi --expname morphable32 --n_ids 8 \
  --res 256 --exp_num 2 --view_num 8 --heldout_views 2 \
  --steps 3000 --white_bkgd --fast \
  --corpus_dir studydata/refine_corpus256b \
  --out_json artifacts/refine_nerf_256.json > /tmp/r5_refine256b.out 2>&1
echo "REFINE256_EXIT=$?"

# --- 4. hygiene ---
timeout 1200 python -u bench.py > /tmp/r5_bench_warm4.out 2>&1
echo "BENCH4_EXIT=$?"
timeout 2400 python -m pytest tests/ -x -q -m "not slow" \
  > /tmp/r5_pytest2.out 2>&1
echo "PYTEST2_EXIT=$?"
echo "FINAL COMPLETE $(date)"
