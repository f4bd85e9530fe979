#!/bin/bash
# Round-4d TPU session: resume the interrupted r4c captures, strictly
# serial (one host CPU + relay timing variance — see CLAUDE.md).
set -x
cd /root/repo

# ---- block 2 remainder: second independent pass for the four families
# the r4c interruption cut off (gan/diffusion/guided/frontier have 2).
for fam in vae vae_frontier distill distill_frontier; do
  for d in 1 2; do
    timeout 1200 python bench_closed_loop.py --family $fam --depth $d \
      --iters 30 --out runs/closed_loop_r4.jsonl
  done
done

# ---- block 3: multi-object whole-scene serving
for pass in 1 2; do
  for k in 2 4; do
    timeout 1200 python bench_closed_loop.py --family gan --multi $k \
      --iters 30 --out runs/closed_loop_r4.jsonl
    timeout 1200 python bench_closed_loop.py --family guided --multi $k \
      --iters 30 --out runs/closed_loop_r4.jsonl
  done
done

# ---- block 5: serve_bench VAE rows
timeout 1800 python -m dexgangrasp_tpu.tools.serve_bench --family vae \
  --out runs/serve_bench_vae.json

# ---- block 1 remainder: 4x VAE stage + VAE frontier head-to-head
timeout 3600 python -m dexgangrasp_tpu.tools.vae_study --data-dir /tmp/dexgg_4x \
  --steps 30000 --out runs/flagship_4x --eva runs/flagship_4x/60000_eva_net.npz
timeout 3600 python -m dexgangrasp_tpu.tools.best_pipeline --data-dir /tmp/dexgg_4x \
  --model vae --diff runs/flagship_4x/30000_vae_net.npz \
  --eva runs/flagship_4x/60000_eva_net.npz --refine-steps 10 \
  --out runs/flagship_4x/best_pipeline_vae.json

echo "R4D_PART1_DONE"

# ---- datasets for part 2 (deterministic regeneration)
python - <<'EOF'
from dexgangrasp_tpu.tools.evaluator_study import build_big_dataset
build_big_dataset("/tmp/dexgg_big", n_objects=64)
build_big_dataset("/tmp/dexgg_8x", n_objects=512)
EOF

# ---- set-prediction quality study (round-4b family, never yet run)
timeout 7200 python -m dexgangrasp_tpu.tools.set_study \
  --data-dir /tmp/dexgg_big --eva runs/eval_study/150000_eva_net.npz \
  --out runs/set_study

echo "R4D_PART2A_DONE"

# ---- set-family serving rows (trained weights from set_study)
for pass in 1 2; do
  for fam in set set_frontier; do
    for d in 1 2; do
      timeout 1200 python bench_closed_loop.py --family $fam --depth $d \
        --iters 30 --out runs/closed_loop_r4.jsonl
    done
  done
done

# ---- 8x scaling, budget-matched: steps scaled with data (60k/40k at 1x
# -> 480k/320k at 8x) to separate "data saturates" from "under-trained"
timeout 14400 python -m dexgangrasp_tpu.tools.scaling_study \
  --scales 512:/tmp/dexgg_8x --eva-steps 480000 --diff-steps 320000 \
  --out runs/scaling_8x_matched

echo "R4D_PART2_DONE"

# ---- third independent session for the headline families
for fam in guided frontier distill_frontier; do
  for d in 1 2; do
    timeout 1200 python bench_closed_loop.py --family $fam --depth $d \
      --iters 30 --out runs/closed_loop_r4.jsonl
  done
done

echo "R4D_SESSION_DONE"
