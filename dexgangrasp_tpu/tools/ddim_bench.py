"""On-chip A/B of the DDIM sampler: XLA lax.scan vs the whole-sampler
Pallas kernel (ops/ddim_chain.py).  Dependency-chained methodology per
CLAUDE.md.

Usage: python -m dexgangrasp_tpu.tools.ddim_bench [--n 1000] [--steps 50]
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def run(ns=(200, 1000, 4096), steps: int = 50, iters: int = 20,
        out_path: str = "runs/ddim_bench.json"):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dexgg_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from dexgangrasp_tpu.models.diffusion import DexDiffuser
    from dexgangrasp_tpu.ops.ddim_chain import ddim_sample_pallas

    model = DexDiffuser()
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))

    report = {"steps": steps, "iters": iters,
              "device": str(jax.devices()[0].device_kind)}

    for n in ns:
        def chain_fn(sampler):
            @functools.partial(jax.jit, static_argnames=("k_iters",))
            def chain(key, k_iters):
                def body(i, carry):
                    key, acc = carry
                    key, k = jax.random.split(key)
                    g = sampler(k)
                    return (key, acc + g[0].sum())
                return jax.lax.fori_loop(0, k_iters, body, (key, 0.0))[1]
            return chain

        def timed(chain):
            float(np.asarray(chain(jax.random.PRNGKey(0), 2)))
            best = 1e30
            for rep in range(3):
                t0 = time.perf_counter()
                float(np.asarray(chain(jax.random.PRNGKey(rep + 1), iters)))
                best = min(best, (time.perf_counter() - t0) / iters)
            return best * 1000.0  # ms per full DDIM-<steps> sample of n

        xla_ms = timed(chain_fn(
            lambda k: model.sample(params, bps, k, n, steps=steps)))
        pal_ms = timed(chain_fn(
            lambda k: ddim_sample_pallas(model, params, bps, k, n,
                                         steps=steps)))
        report[f"n{n}_xla_ms"] = round(xla_ms, 3)
        report[f"n{n}_pallas_ms"] = round(pal_ms, 3)
        report[f"n{n}_speedup"] = round(xla_ms / pal_ms, 3)
        print(json.dumps(report), flush=True)

    # on-chip numerics: the DDIM recursion chaotically amplifies matmul-
    # precision noise over S steps, so elementwise closeness must be read
    # against the XLA sampler's OWN precision envelope (default vs
    # highest-precision matmuls) — the kernel is a bug only if it exceeds
    # that yardstick
    k = jax.random.PRNGKey(9)
    a = model.sample(params, bps, k, 256, steps=steps)
    with jax.default_matmul_precision("highest"):
        hi = model.sample(params, bps, k, 256, steps=steps)
    b = ddim_sample_pallas(model, params, bps, k, 256, steps=steps)
    report["max_abs_diff_vs_xla"] = float(jnp.max(jnp.abs(a - b)))
    report["xla_default_vs_highest"] = float(jnp.max(jnp.abs(a - hi)))
    print(json.dumps(report))
    import os
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="runs/ddim_bench.json")
    args = ap.parse_args()
    run(steps=args.steps, iters=args.iters, out_path=args.out)


if __name__ == "__main__":
    main()
