#!/bin/sh
# Round-5 master orchestrator: everything after chain1 (flagship retrain +
# fit/serve/eval), strictly sequenced for the 1-core host + single TPU.
# Stage order tracks VERDICT r4 "next round" priorities:
#   wild demo (#6) -> 32-id scale-up (#4) + scaling table -> clean
#   RefineNet corpus (#3) -> full 20-expression bank (#5).
# The 512^2 refine study (#7) is run separately if wall-clock remains.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 0: wait for chain1 to finish (it owns the TPU + host until then)
C1=$(cat /tmp/chain1.pid)
while kill -0 "$C1" 2>/dev/null; do sleep 60; done
echo "CHAIN1_DONE $(date)"

# 1: wild-photo end-to-end demo on the flagship checkpoint (VERDICT #6)
timeout 5400 python -u examples/wild_demo.py > /tmp/r5_wild.out 2>&1
echo "WILD_EXIT=$?"

# 2: faces32 dataset (CPU ~10 min) — unblocks the 32-id train
timeout 3600 python -u scratch/gen_round5.py --sets faces32 \
  > /tmp/r5_gen_a.out 2>&1
echo "GEN_A_EXIT=$?"

# 3: 32-id morphable train (VERDICT #4). The remaining CPU datagen runs
# alongside at idle priority: nice 19 keeps the train's host thread fed,
# and the supervisor recovers any axon wedge (CLAUDE.md round-3 note).
nice -n 19 timeout 10800 python -u scratch/gen_round5.py \
  --sets faces16x20,faces32hi > /tmp/r5_gen_b.out 2>&1 &
GEN_B=$!
sh scratch/supervise_train.sh morphable32 studydata/faces32 32 40000 \
  > /tmp/r5_sup_m32.out 2>&1
echo "TRAIN32_EXIT=$?"
wait "$GEN_B"
echo "GEN_B_EXIT=$?"

timeout 7200 python -u examples/morphable_flagship.py --stage eval \
  --data studydata/faces32 --n_ids 32 --expname morphable32 --white_bkgd \
  --exp_matrix_ids 2 --out_json artifacts/morphable32.json \
  > /tmp/r5_eval32.out 2>&1
echo "EVAL32_EXIT=$?"
python -u examples/morphable_scaling.py > /tmp/r5_scaling.out 2>&1
echo "SCALING_EXIT=$?"

# 4: clean RefineNet corpus: morphable32 renders vs pixel-aligned faces32hi
# GT; the corpus sanity floor fails loudly on any sub-16 dB pair (the
# round-4 identity-0 defect class). (VERDICT #3)
timeout 10800 python -u examples/refine_nerf_corpus.py \
  --data studydata/faces32hi --expname morphable32 --n_ids 32 \
  --res 256 --exp_num 4 --view_num 12 --heldout_views 2 \
  --steps 3000 --white_bkgd --fast \
  --corpus_dir studydata/refine_corpus32 > /tmp/r5_refine.out 2>&1
echo "REFINE_EXIT=$?"

# 5: full 20-expression bank with strengthened deltas, warm-started from
# morphable32 at 40k (ids 0..15 shared — seed 11), 20k fine-tune (VERDICT #5)
mkdir -p studydata/logs/morphable16x20r5
if [ ! -d studydata/logs/morphable16x20r5/checkpoints ]; then
  cp -r studydata/logs/morphable32/checkpoints \
    studydata/logs/morphable16x20r5/
fi
sh scratch/supervise_train.sh morphable16x20r5 studydata/faces16x20 16 60000 \
  > /tmp/r5_sup_16x20.out 2>&1
echo "TRAIN20_EXIT=$?"
timeout 7200 python -u examples/morphable_flagship.py --stage eval \
  --data studydata/faces16x20 --n_ids 16 --expname morphable16x20r5 \
  --white_bkgd --exp_matrix_ids 2 --out_json artifacts/morphable16x20.json \
  > /tmp/r5_eval20.out 2>&1
echo "EVAL20_EXIT=$?"

echo "MASTER COMPLETE"
