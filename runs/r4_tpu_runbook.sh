#!/bin/bash
# Round-4 TPU session runbook (run serially, one job at a time — relay
# timing variance + single host CPU; see CLAUDE.md).  Each block is
# standalone; re-run any that fail after a relay hiccup.
set -x
cd /root/repo

# 0. driver-contract bench (also records the round's numbers)
python bench.py | tee runs/bench_r4_run1.json

# 1. flagship at 4x data scale (VERDICT r3 next-2): evaluator 60k +
#    diffusion 40k + VAE 30k at 256 objects, then the composed frontier
#    through the product path
python -m dexgangrasp_tpu.tools.evaluator_study --data-dir /tmp/dexgg_4x \
  --steps 60000 --out runs/flagship_4x --n-objects 256
python -m dexgangrasp_tpu.tools.diffusion_study --data-dir /tmp/dexgg_4x \
  --steps 40000 --out runs/flagship_4x --eva runs/flagship_4x/60000_eva_net.npz
python -m dexgangrasp_tpu.tools.vae_study --data-dir /tmp/dexgg_4x \
  --steps 30000 --out runs/flagship_4x --eva runs/flagship_4x/60000_eva_net.npz
python -m dexgangrasp_tpu.tools.best_pipeline --data-dir /tmp/dexgg_4x \
  --diff runs/flagship_4x/40000_diffusion_net.npz \
  --eva runs/flagship_4x/60000_eva_net.npz --refine-steps 10 \
  --out runs/flagship_4x/best_pipeline.json
# VAE frontier head-to-head (VERDICT r3 next-4)
python -m dexgangrasp_tpu.tools.best_pipeline --data-dir /tmp/dexgg_4x \
  --model vae --diff runs/flagship_4x/30000_vae_net.npz \
  --eva runs/flagship_4x/60000_eva_net.npz --refine-steps 10 \
  --out runs/flagship_4x/best_pipeline_vae.json

# 2. closed-loop: latency p50/p95 at depth 1 vs 2, all families incl VAE
for fam in gan guided frontier vae vae_frontier; do
  for d in 1 2; do
    python bench_closed_loop.py --family $fam --depth $d \
      --out runs/closed_loop_r4.jsonl
  done
done

# 3. multi-object whole-scene serving (VERDICT r3 next-8)
python bench_closed_loop.py --family gan --multi 3 --out runs/closed_loop_r4.jsonl
python bench_closed_loop.py --family guided --multi 3 --out runs/closed_loop_r4.jsonl

# 4. 8x scaling, budget-matched (VERDICT r3 next-6): steps ∝ data
#    (64-object baseline 60k/40k → 512 objects = 8x)
python -m dexgangrasp_tpu.tools.scaling_study \
  --scales 512:/tmp/dexgg_8x --eva-steps 480000 --diff-steps 320000 \
  --out runs/scaling_8x_matched

# 5. serve_bench VAE rows (same-host-contention caveat applies)
python -m dexgangrasp_tpu.tools.serve_bench --family vae \
  --out runs/serve_bench_vae.json
