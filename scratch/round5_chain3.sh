#!/bin/sh
# Round-5 chain, stage 3: full 20-expression bank with the strengthened
# deltas (VERDICT r5 #5), warm-started from morphable32 (ids 0..15 are the
# same identities — shared seed), then the clean RefineNet corpus from the
# morphable32 checkpoint (VERDICT r5 #3).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

mkdir -p studydata/logs/morphable16x20r5
cp -r studydata/logs/morphable32/checkpoints studydata/logs/morphable16x20r5/
sh scratch/supervise_train.sh morphable16x20r5 studydata/faces16x20 16 75000 \
  > /tmp/r5_sup_16x20.out 2>&1
echo "TRAIN20_EXIT=$?"

timeout 10800 python -u examples/morphable_flagship.py --stage eval \
  --data studydata/faces16x20 --n_ids 16 --expname morphable16x20r5 \
  --white_bkgd --exp_matrix_ids 2 --out_json artifacts/morphable16x20.json \
  > /tmp/r5_eval20.out 2>&1
echo "EVAL20_EXIT=$?"

# RefineNet on a CLEAN corpus: renders from morphable32 at 256^2 against
# pixel-aligned faces32hi GT; the corpus sanity floor fails loudly on any
# sub-16 dB pair (round 4's identity-0 defect class)
timeout 14400 python -u examples/refine_nerf_corpus.py \
  --data studydata/faces32hi --expname morphable32 --n_ids 32 \
  --res 256 --exp_num 4 --view_num 12 --heldout_views 2 \
  --steps 3000 --white_bkgd --fast \
  --corpus_dir studydata/refine_corpus32 > /tmp/r5_refine.out 2>&1
echo "REFINE_EXIT=$?"

echo "CHAIN3 COMPLETE"
