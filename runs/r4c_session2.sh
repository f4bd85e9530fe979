#!/bin/bash
# Round-4c TPU session, part 2: dataset builds + set-prediction study +
# 8x budget-matched scaling (VERDICT r3 next-6).  Serial.
set -x
cd /root/repo

# ---- datasets (deterministic regeneration; evaluator_study builds on
# demand with the canonical views=4/grasps=150/seed=42 recipe)
python - <<'EOF'
from dexgangrasp_tpu.tools.evaluator_study import build_big_dataset
build_big_dataset("/tmp/dexgg_big", n_objects=64)
build_big_dataset("/tmp/dexgg_8x", n_objects=512)
EOF

# ---- set-prediction quality study (round-4b family, never yet run)
timeout 7200 python -m dexgangrasp_tpu.tools.set_study \
  --data-dir /tmp/dexgg_big --eva runs/eval_study/150000_eva_net.npz \
  --out runs/set_study

# ---- 8x scaling, budget-matched: steps scaled with data (60k/40k at 1x
# -> 480k/320k at 8x) to separate "data saturates" from "under-trained"
timeout 14400 python -m dexgangrasp_tpu.tools.scaling_study \
  --scales 512:/tmp/dexgg_8x --eva-steps 480000 --diff-steps 320000 \
  --out runs/scaling_8x_matched

echo "R4C_SESSION_PART2_DONE"
