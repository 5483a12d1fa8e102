#!/bin/sh
# Round-5 LITE 512^2 RefineNet study (VERDICT r4 #7) sized to fit a short
# end-of-round window: uses the ALREADY-TRAINED flagship (faces8, seed 7)
# instead of waiting for morphable32, and a 160-pair corpus.
#   (a) 8-id x 2-exp 512^2 GT datagen (~18 min CPU, nice 19)
#   (b) wait for the master to release the TPU
#   (c) refine study: flagship renders at 512^2 vs pixel-aligned 512^2 GT
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

nice -n 19 timeout 3600 python -u scratch/gen_round5.py \
  --sets faces8hi512 > /tmp/r5_gen_512lite.out 2>&1
echo "GEN512LITE_EXIT=$?"

M=$(cat /tmp/master.pid)
while kill -0 "$M" 2>/dev/null; do sleep 60; done

timeout 9000 python -u examples/refine_nerf_corpus.py \
  --data studydata/faces8hi512 --expname morphable_flagship --n_ids 8 \
  --res 512 --exp_num 2 --view_num 8 --heldout_views 2 \
  --steps 3000 --white_bkgd --fast \
  --corpus_dir studydata/refine_corpus512 \
  --out_json artifacts/refine_nerf_512.json > /tmp/r5_refine512.out 2>&1
echo "REFINE512_EXIT=$?"
echo "CHAIN512LITE COMPLETE"
