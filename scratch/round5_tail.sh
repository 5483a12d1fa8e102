#!/bin/sh
# Round-5 tail: everything after round5_master.sh releases the TPU.
# The master's stage-4 corpus render (32 ids x 48 views at ~19 s/view) was
# sized for ~8h but capped by a 3h timeout, so it exits with a PARTIAL
# corpus (ids 0..K-1 complete; render CLI is resumable and flushes the
# manifest per identity). This tail:
#   (a) waits for the master (stage 5, the 20-exp fine-tune, runs last),
#   (b) re-invokes the refine study with n_ids=K — the render step skips
#       every existing id dir, so it goes straight to GT pairing + GAN
#       training on the clean partial corpus (VERDICT r4 #3),
#   (c) runs the LITE 512^2 refine study against the already-generated
#       seed-7 faces8hi512 GT (VERDICT r4 #7),
#   (d) warms the bench shapes twice (the relay round-robins compile
#       caches across backend servers — warming = repetition) and runs the
#       fast test tier while the TPU is idle.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

M=$(cat /tmp/master.pid)
while kill -0 "$M" 2>/dev/null; do sleep 60; done
echo "MASTER_DONE $(date)"

# (b) GAN training on the complete ids of the 256^2 morphable32 corpus
N=$(python -c "import json,os; m=json.load(open('studydata/refine_corpus32/train/gt_manifest.json')); print(len({r.split(os.sep)[0] for r in m}))")
echo "COMPLETE_IDS=$N"
timeout 7200 python -u examples/refine_nerf_corpus.py \
  --data studydata/faces32hi --expname morphable32 --n_ids "$N" \
  --res 256 --exp_num 4 --view_num 12 --heldout_views 2 \
  --steps 3000 --white_bkgd --fast \
  --corpus_dir studydata/refine_corpus32 > /tmp/r5_refine_gan.out 2>&1
echo "REFINE_GAN_EXIT=$?"

# (c) 512^2 refine study (flagship checkpoint, faces8hi512 GT)
timeout 12600 python -u examples/refine_nerf_corpus.py \
  --data studydata/faces8hi512 --expname morphable_flagship --n_ids 8 \
  --res 512 --exp_num 2 --view_num 8 --heldout_views 2 \
  --steps 3000 --white_bkgd --fast \
  --corpus_dir studydata/refine_corpus512 \
  --out_json artifacts/refine_nerf_512.json > /tmp/r5_refine512.out 2>&1
echo "REFINE512_EXIT=$?"

# (d) bench warm-up x2 + fast test tier on the now-idle host
timeout 1200 python -u bench.py > /tmp/r5_bench_warm1.out 2>&1
echo "BENCH1_EXIT=$?"
timeout 1200 python -u bench.py > /tmp/r5_bench_warm2.out 2>&1
echo "BENCH2_EXIT=$?"
timeout 2400 python -m pytest tests/ -x -q -m "not slow" \
  > /tmp/r5_pytest.out 2>&1
echo "PYTEST_EXIT=$?"
echo "TAIL COMPLETE $(date)"
