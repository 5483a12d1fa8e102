#!/bin/sh
# Round-5 chain, stage 4: wild-photo end-to-end demo (VERDICT r5 #6) and a
# 512^2 RefineNet study (VERDICT r5 #7).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

timeout 10800 python -u examples/wild_demo.py > /tmp/r5_wild.out 2>&1
echo "WILD_EXIT=$?"

# 512^2 refine: renders from morphable32 at 512^2 against upscaled GT is
# pointless (GT caps at 256^2 raster detail) — rasterize true 512^2 GT via
# --res 512 on the corpus renderer against faces32hi's poses instead; see
# examples/refine_nerf_corpus.py --res. Smaller corpus (2 exps x 8 views x
# 32 ids = 512 pairs) keeps the render budget sane.
timeout 14400 python -u examples/refine_nerf_corpus.py \
  --data studydata/faces32hi512 --expname morphable32 --n_ids 32 \
  --res 512 --exp_num 2 --view_num 8 --heldout_views 2 \
  --steps 3000 --white_bkgd --fast \
  --corpus_dir studydata/refine_corpus512 \
  --out_json artifacts/refine_nerf_512.json > /tmp/r5_refine512.out 2>&1
echo "REFINE512_EXIT=$?"

echo "CHAIN4 COMPLETE"
