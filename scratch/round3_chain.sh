#!/bin/sh
# Round-3 measurement chain: waits for the flagship training to finish,
# then runs every study against the trained checkpoint, sequentially
# (one host core — never fan out). Logs under /tmp/chain_*.out.
set -x
cd /root/repo

# 1. wait for the training process to exit
TRAIN_PID=$(cat /tmp/morphable_train.pid)
while kill -0 "$TRAIN_PID" 2>/dev/null; do sleep 30; done
echo "training done: $(tail -1 /tmp/morphable_train.out)"

# 2. held-out morphable evaluation (the core capability artifact)
timeout 5400 python examples/morphable_flagship.py --stage eval \
  > /tmp/chain_eval.out 2>&1
echo "EVAL_EXIT=$?"

# 3. trained-checkpoint distill + fused serve (quality + throughput)
timeout 5400 python examples/serve_flagship.py \
  > /tmp/chain_serve.out 2>&1
echo "SERVE_EXIT=$?"

# 4. fitting quality with known ground truth
timeout 5400 python examples/fit_quality.py \
  > /tmp/chain_fit.out 2>&1
echo "FIT_EXIT=$?"

# 5. RefineNet on real NeRF renders (corpus CLIs + GAN + metrics)
timeout 7200 python examples/refine_nerf_corpus.py --steps 3000 \
  > /tmp/chain_refine.out 2>&1
echo "REFINE_EXIT=$?"

# 6. serve-quality breadth across structurally distinct scenes
timeout 7200 python examples/distill_scenes.py \
  > /tmp/chain_scenes.out 2>&1
echo "SCENES_EXIT=$?"

echo "CHAIN COMPLETE"
