#!/bin/bash
# Round-4c TPU session: remaining runbook blocks, strictly serial
# (one host CPU + relay timing variance — see CLAUDE.md).
set -x
cd /root/repo

# ---- block 2: closed-loop latency p50/p95 at depth 1 vs 2, all families.
# Two passes = two independent processes per configuration (relay variance).
for pass in 1 2; do
  for fam in gan diffusion guided frontier vae vae_frontier distill distill_frontier; do
    for d in 1 2; do
      timeout 1200 python bench_closed_loop.py --family $fam --depth $d \
        --iters 30 --out runs/closed_loop_r4.jsonl
    done
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

echo "R4C_SESSION_PART1_DONE"
