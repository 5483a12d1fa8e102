#!/bin/sh
# Round-3 chain v2: after the WHITE-BKGD flagship retrain finishes, run
# every dependent study sequentially (one host core — never fan out).
# Logs under /tmp/chain2_*.out.
set -x
cd /root/repo

TRAIN_PID=$(cat /tmp/retrain_w.pid)
while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 30; done
echo "training done: $(tail -1 /tmp/retrain_w.out)"

# 1. held-out morphable evaluation (the core capability artifact)
timeout 5400 python examples/morphable_flagship.py --stage eval --white_bkgd \
  > /tmp/chain2_eval.out 2>&1
echo "EVAL_EXIT=$?"

# 2. trained-checkpoint distill + fused serve (quality + throughput)
timeout 5400 python examples/serve_flagship.py --white_bkgd \
  > /tmp/chain2_serve.out 2>&1
echo "SERVE_EXIT=$?"

# 3. fitting quality with known ground truth
timeout 5400 python examples/fit_quality.py --white_bkgd \
  > /tmp/chain2_fit.out 2>&1
echo "FIT_EXIT=$?"

# 4. RefineNet on real NeRF renders (fresh corpus — the old one was
#    rendered from the black-bg curtain checkpoint)
rm -rf studydata/refine_corpus
timeout 7200 python examples/refine_nerf_corpus.py --steps 3000 --white_bkgd \
  > /tmp/chain2_refine.out 2>&1
echo "REFINE_EXIT=$?"

# 5. serve-quality breadth across structurally distinct scenes (white-bkgd
#    fix; checkpoint-independent)
timeout 7200 python examples/distill_scenes.py \
  > /tmp/chain2_scenes.out 2>&1
echo "SCENES_EXIT=$?"

echo "CHAIN2 COMPLETE"
