#!/bin/sh
# Round-3 chain v3: after chain2, rerun the round-2 serving-quality studies
# so every serving artifact carries SSIM alongside PSNR (VERDICT r2 #5).
set -x
cd /root/repo

CHAIN2_PID=$(cat /tmp/chain2.pid)
while kill -0 "$CHAIN2_PID" 2>/dev/null; do sleep 30; done
echo "chain2 done"

timeout 5400 python examples/distill_synthetic.py \
  --artifacts artifacts/distill_quality.json \
  > /tmp/chain3_distill.out 2>&1
echo "DISTILL_EXIT=$?"

timeout 5400 python examples/distill_expression.py \
  --artifacts artifacts/cond_student_quality.json \
  > /tmp/chain3_condtoy.out 2>&1
echo "CONDTOY_EXIT=$?"

timeout 7200 python examples/distill_expression.py --flagship \
  --artifacts artifacts/cond_student_flagship.json \
  > /tmp/chain3_condflag.out 2>&1
echo "CONDFLAG_EXIT=$?"

timeout 5400 python examples/distill_morphable.py \
  --artifacts artifacts/avatar_student_quality.json \
  > /tmp/chain3_avatar.out 2>&1
echo "AVATAR_EXIT=$?"

echo "CHAIN3 COMPLETE"
