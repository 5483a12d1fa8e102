#!/bin/sh
# Round-5 optional last stage: 512^2 RefineNet study (VERDICT r5 #7).
# Launch manually once the master's 16x20 fine-tune is running: the 512^2
# GT datagen (~70 min CPU) overlaps that supervised train at idle priority,
# then the refine study itself runs after the master completes.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# (a) 512^2 GT corpus, idle priority under the wedge supervisor's watch
nice -n 19 timeout 10800 python -u scratch/gen_round5.py \
  --sets faces32hi512 > /tmp/r5_gen_512.out 2>&1
echo "GEN512_EXIT=$?"

# (b) wait for the master to release the TPU
M=$(cat /tmp/master.pid)
while kill -0 "$M" 2>/dev/null; do sleep 60; done

# (c) 512^2 refine: morphable32 renders at 512^2 vs true 512^2 rasterized GT
timeout 14400 python -u examples/refine_nerf_corpus.py \
  --data studydata/faces32hi512 --expname morphable32 --n_ids 32 \
  --res 512 --exp_num 2 --view_num 8 --heldout_views 2 \
  --steps 3000 --white_bkgd --fast \
  --corpus_dir studydata/refine_corpus512 \
  --out_json artifacts/refine_nerf_512.json > /tmp/r5_refine512.out 2>&1
echo "REFINE512_EXIT=$?"
echo "CHAIN512 COMPLETE"
