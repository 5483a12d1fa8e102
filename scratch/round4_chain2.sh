#!/bin/sh
# Round-4 chain, stage 2 (after morphable16 40k train): each block is ONE
# TPU process, host otherwise idle. Run blocks sequentially, inspecting
# artifacts between them.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# --- A: 16-id eval + expression-transfer matrix over the 4 trained exps
timeout 7200 python -u examples/morphable_flagship.py --stage eval \
  --data studydata/faces16 --n_ids 16 --expname morphable16 --white_bkgd \
  --exp_matrix_ids 2 \
  --out_json artifacts/morphable16.json > /tmp/r4_eval16.out 2>&1
echo "EVAL_EXIT=$?"

# --- B: RefineNet on REAL NeRF artifacts with headroom: 128^2-trained
# model rendered at 256^2 against pixel-aligned 256^2 rasterized GT,
# 768 pairs, perceptual term ON (VERDICT r3 #1)
timeout 10800 python -u examples/refine_nerf_corpus.py \
  --data studydata/faces16hi --expname morphable16 --n_ids 16 \
  --res 256 --exp_num 4 --view_num 12 --heldout_views 2 \
  --steps 3000 --white_bkgd --fast \
  --corpus_dir studydata/refine_corpus16 > /tmp/r4_refine.out 2>&1
echo "REFINE_EXIT=$?"

# --- C: full 20-expression bank fine-tune (warm start from morphable16)
mkdir -p studydata/logs/morphable16x20
cp -r studydata/logs/morphable16/checkpoints studydata/logs/morphable16x20/
timeout 14400 python -u examples/morphable_flagship.py --stage train \
  --data studydata/faces16x20 --n_ids 16 --expname morphable16x20 \
  --iters 60000 --white_bkgd --device_data > /tmp/r4_train20.out 2>&1
echo "TRAIN20_EXIT=$?"
timeout 7200 python -u examples/morphable_flagship.py --stage eval \
  --data studydata/faces16x20 --n_ids 16 --expname morphable16x20 \
  --white_bkgd --exp_matrix_ids 2 \
  --out_json artifacts/morphable16x20.json > /tmp/r4_eval20.out 2>&1
echo "EVAL20_EXIT=$?"

# --- D: gated scene-breadth distillation (VERDICT r3 #2)
timeout 10800 python -u examples/distill_scenes.py > /tmp/r4_scenes.out 2>&1
echo "SCENES_EXIT=$?"

# --- E: pose-manifold fitting quality (VERDICT r3 #4)
timeout 7200 python -u examples/fit_quality.py \
  --data studydata/faces16 --n_ids 16 --expname morphable16 --white_bkgd \
  > /tmp/r4_fit.out 2>&1
echo "FIT_EXIT=$?"

# --- F: production serving off the trained 16-id checkpoint
timeout 10800 python -u examples/serve_flagship.py \
  --data studydata/faces16 --n_ids 16 --expname morphable16 --white_bkgd \
  > /tmp/r4_serve.out 2>&1
echo "SERVE_EXIT=$?"

# --- G: headline bench
timeout 3600 python -u bench.py > /tmp/r4_bench.out 2>&1
echo "BENCH_EXIT=$?"
echo "CHAIN2 COMPLETE"
