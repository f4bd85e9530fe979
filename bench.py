#!/usr/bin/env python3
"""Benchmark: generated+scored grasps/sec on one chip.

The BASELINE.json north-star workload: per object, encode-once →
sample-N → generator → evaluator-score → sort/top-k, all in one fused XLA
program.  Baseline target: 10,000 grasps/sec/chip (the driver-set bar the
reference's serial host-roundtrip loop is assumed to meet on GPU).

Prints ONE JSON line:
  {"metric": "grasps_per_sec", "value": N, "unit": "grasps/s",
   "vs_baseline": N/10000}
"""
import json
import sys
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: first-compile of the fused program is
    # expensive on a fresh process; cache it across bench runs
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/dexgg_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from dexgangrasp_tpu.engine import folding
    from dexgangrasp_tpu.engine.pipeline import sample_and_score
    from dexgangrasp_tpu.models.networks import init_dexgan, init_evaluator

    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    gen_folded = folding.fold_generator(gp, gs)
    eva_folded = folding.fold_evaluator(ep, es)

    rng = np.random.default_rng(0)
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))

    n = 65536  # grasps per program invocation
    key = jax.random.PRNGKey(0)

    # warmup / compile
    g = sample_and_score(gen_folded, eva_folded, bps, key, n)
    jax.block_until_ready(g.score)

    # steady state: distinct keys per call to avoid caching artifacts
    iters = 20
    keys = jax.random.split(jax.random.PRNGKey(1), iters)
    t0 = time.perf_counter()
    for i in range(iters):
        g = sample_and_score(gen_folded, eva_folded, bps, keys[i], n)
    jax.block_until_ready(g.score)
    dt = time.perf_counter() - t0

    grasps_per_sec = iters * n / dt
    print(json.dumps({
        "metric": "grasps_per_sec",
        "value": round(grasps_per_sec, 1),
        "unit": "grasps/s",
        "vs_baseline": round(grasps_per_sec / 10000.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
