"""On-chip A/B of the PRODUCTION sampler: XLA guided-DDIM scan
(engine/diffusion_pipeline.sample_and_score_guided) vs the whole guided
chain as one Pallas kernel (ops/guided_ddim.py).  Dependency-chained
methodology per CLAUDE.md; uses trained checkpoints when available so
the guidance gradient is non-vacuous (ADVICE r2 rule).

Usage: python -m dexgangrasp_tpu.tools.guided_bench [--n 1000]
       [--steps 10] [--scale 10] [--tile 128]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time

import numpy as np


def run(ns=(200, 1000, 4096), steps: int = 10, scale: float = 10.0,
        iters: int = 20, tile: int = 128,
        diff_ckpt: str = "runs/diffusion_xl/40000_diffusion_net.npz",
        eva_ckpt: str = "runs/eval_study_xl/300000_eva_net.npz",
        out_path: str = "runs/guided_bench.json"):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dexgg_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from dexgangrasp_tpu.engine import folding
    from dexgangrasp_tpu.engine.diffusion_pipeline import (
        sample_and_score_guided,
    )
    from dexgangrasp_tpu.models.diffusion import DexDiffuser, GraspNormalizer
    from dexgangrasp_tpu.models.networks import DexEvaluator
    from dexgangrasp_tpu.ops.guided_ddim import guided_sample_pallas
    from dexgangrasp_tpu.train import checkpoints as ckpt

    model = DexDiffuser()
    normalizer = None
    if os.path.exists(diff_ckpt):
        trees, _ = ckpt.load_pytrees(diff_ckpt)
        diff_params = trees["params"]
        normalizer = GraspNormalizer(mean=trees["normalizer_mean"],
                                     std=trees["normalizer_std"])
        trained = True
    else:
        diff_params = model.init(jax.random.PRNGKey(0))
        trained = False
    if os.path.exists(eva_ckpt):
        etrees, _ = ckpt.load_pytrees(eva_ckpt)
        ep, es = etrees["params"], etrees["state"]
    else:
        ep, es = DexEvaluator().init(jax.random.PRNGKey(1))
    ef = folding.fold_evaluator(ep, es)

    # prefer a REAL eval-view bps so the trained evaluator's scores (and
    # therefore the guidance gradient field) are non-vacuous
    import glob
    views = sorted(glob.glob("/tmp/dexgg_xl/eval/bps/*/*.npy"))
    if views:
        bps = jnp.asarray(np.load(views[0]).ravel().astype(np.float32))
    else:
        rng = np.random.default_rng(0)
        bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))

    report = {"steps": steps, "scale": scale, "iters": iters, "tile": tile,
              "trained_ckpts": trained, "real_view": bool(views),
              "device": str(jax.devices()[0].device_kind)}

    for n in ns:
        def chain_fn(sampler):
            @functools.partial(jax.jit, static_argnames=("k_iters",))
            def chain(key, k_iters):
                def body(i, carry):
                    key, acc = carry
                    key, k = jax.random.split(key)
                    out = sampler(k)
                    return (key, acc + out.sum())
                return jax.lax.fori_loop(0, k_iters, body, (key, 0.0))[1]
            return chain

        def timed(chain):
            float(np.asarray(chain(jax.random.PRNGKey(0), 2)))
            best = 1e30
            for rep in range(3):
                t0 = time.perf_counter()
                float(np.asarray(chain(jax.random.PRNGKey(rep + 1), iters)))
                best = min(best, (time.perf_counter() - t0) / iters)
            return best * 1000.0  # ms per full guided sample of n

        xla_ms = timed(chain_fn(
            lambda k: sample_and_score_guided(
                model, diff_params, ef, normalizer, bps, k, n, steps=steps,
                guidance_scale=scale).score))
        pal_ms = timed(chain_fn(
            lambda k: guided_sample_pallas(
                model, diff_params, ef, normalizer, bps, k, n, steps=steps,
                guidance_scale=scale, tile=tile)[3]))
        report[f"n{n}_xla_ms"] = round(xla_ms, 3)
        report[f"n{n}_pallas_ms"] = round(pal_ms, 3)
        report[f"n{n}_speedup"] = round(xla_ms / pal_ms, 3)
        print(json.dumps(report), flush=True)

    # numerics: judge kernel-vs-XLA drift against the XLA guided sampler's
    # OWN default-vs-highest-precision envelope (the guided recursion
    # chaotically amplifies matmul noise; CLAUDE.md rule)
    k = jax.random.PRNGKey(9)
    a = sample_and_score_guided(model, diff_params, ef, normalizer, bps, k,
                                256, steps=steps, guidance_scale=scale)
    with jax.default_matmul_precision("highest"):
        hi = sample_and_score_guided(model, diff_params, ef, normalizer,
                                     bps, k, 256, steps=steps,
                                     guidance_scale=scale)
    rot, transl, joints, score, _ = guided_sample_pallas(
        model, diff_params, ef, normalizer, bps, k, 256, steps=steps,
        guidance_scale=scale, tile=tile)
    report["transl_max_abs_vs_xla"] = float(
        jnp.max(jnp.abs(transl - a.transl)))
    report["transl_xla_default_vs_highest"] = float(
        jnp.max(jnp.abs(a.transl - hi.transl)))
    report["score_max_abs_vs_xla"] = float(jnp.max(jnp.abs(score - a.score)))
    report["score_xla_default_vs_highest"] = float(
        jnp.max(jnp.abs(a.score - hi.score)))
    report["score_mean_xla"] = float(jnp.mean(a.score))
    report["score_mean_pallas"] = float(jnp.mean(score))
    print(json.dumps(report))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--scale", type=float, default=10.0)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--out", default="runs/guided_bench.json")
    args = ap.parse_args()
    run(steps=args.steps, scale=args.scale, iters=args.iters,
        tile=args.tile, out_path=args.out)


if __name__ == "__main__":
    main()
