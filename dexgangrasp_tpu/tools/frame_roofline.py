"""Stage attribution for the fused closed-loop frame program (BASELINE
config #5) — the per-frame counterpart of tools/roofline.py.

Times dependency-chained jitted subprograms of the frame pipeline
(engine/frame_pipeline.py) at the serving shapes and derives where the
per-frame device milliseconds go:

  outlier      — device outlier mask alone (kNN/radius count)
  segment      — full segmentation (outlier + RANSAC plane + mask)
  perception   — segmentation + centering + compaction + BPS encode
  sampler      — sample+score+top-k on a fixed bps (no perception)
  full         — the whole frame program (perception + sampler)

All timings follow the CLAUDE.md relay rule: one jitted fori_loop per
variant with a threaded data dependency, materialized via np.asarray,
best-of-3.

Usage (TPU, quiet machine):
    python -m dexgangrasp_tpu.tools.frame_roofline [--family gan|guided]
        [--pad-n 8192] [--n-samples 10000]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=("gan", "guided"), default="gan")
    ap.add_argument("--pad-n", type=int, default=8192)
    ap.add_argument("--n-samples", type=int, default=None,
                    help="default: 10000 gan / 1000 guided")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default="runs/frame_roofline.json")
    args = ap.parse_args()
    n_samples = args.n_samples or (10000 if args.family == "gan" else 1000)

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dexgg_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from dexgangrasp_tpu.engine import folding
    from dexgangrasp_tpu.engine.frame_pipeline import (
        _segment_center_encode,
        frame_to_grasps,
        frame_to_grasps_diffusion,
    )
    from dexgangrasp_tpu.engine.pipeline import sample_and_score
    from dexgangrasp_tpu.models.networks import init_dexgan, init_evaluator
    from dexgangrasp_tpu.ops.bps import PAD_VALUE, generate_basis
    from dexgangrasp_tpu.ops.perception import segment_object_device

    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    gen_folded = folding.fold_generator(gp, gs)
    eva_folded = folding.fold_evaluator(ep, es)
    basis = generate_basis(jax.random.PRNGKey(2))

    if args.family == "guided":
        from dexgangrasp_tpu.engine.diffusion_pipeline import DiffusionEngine

        deng = DiffusionEngine.from_checkpoints(None, ddim_steps=10,
                                                guidance_scale=10.0,
                                                use_ddim_kernel=False)

    # a realistic decimated frame: plane + object, padded to pad_n
    rng = np.random.default_rng(0)
    n_pts = min(5000, (args.pad_n * 3) // 4)
    n_plane, n_obj = (n_pts * 7) // 10, n_pts - (n_pts * 7) // 10
    plane = np.stack([rng.uniform(-0.25, 0.25, n_plane),
                      rng.uniform(-0.2, 0.2, n_plane),
                      np.full(n_plane, 0.9)], axis=1)
    obj = np.stack([rng.uniform(-0.05, 0.05, n_obj),
                    rng.uniform(-0.05, 0.05, n_obj),
                    0.82 + 0.04 * rng.random(n_obj)], axis=1)
    pts = np.concatenate([plane, obj]).astype(np.float32)
    pts += rng.normal(size=pts.shape).astype(np.float32) * 5e-4
    padded = np.full((args.pad_n, 3), PAD_VALUE, np.float32)
    padded[:pts.shape[0]] = pts
    points = jnp.asarray(padded)
    n_valid = jnp.asarray(pts.shape[0])
    fixed_bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    seg_kw = dict(method="statistical", iterations=1024)

    def chain(body):
        @functools.partial(jax.jit, static_argnames=("k_iters",))
        def run(key, k_iters):
            def step(i, carry):
                return body(*carry)
            return jax.lax.fori_loop(0, k_iters, step, (key, 0.0))[1]
        return run

    def timed(c):
        float(np.asarray(c(jax.random.PRNGKey(0), 2)))
        best = None
        for rep in range(3):
            t0 = time.perf_counter()
            float(np.asarray(c(jax.random.PRNGKey(rep + 1), args.iters)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best / args.iters

    def outlier_body(key, acc):
        key, k = jax.random.split(key)
        p = points + acc * 1e-12
        from dexgangrasp_tpu.ops.perception import (
            statistical_outlier_mask_device,
        )

        m = statistical_outlier_mask_device(p, n_valid)
        return key, acc + jnp.sum(m) * 1e-9

    def segment_body(key, acc):
        key, k = jax.random.split(key)
        m = segment_object_device(points + acc * 1e-12, n_valid, k,
                                  **seg_kw)
        return key, acc + jnp.sum(m) * 1e-9

    def perception_body(key, acc):
        key, k = jax.random.split(key)
        bps, center, n_obj_, _clip = _segment_center_encode(
            basis, points + acc * 1e-12, n_valid, k,
            outlier_method="statistical", plane_first=False)
        return key, acc + bps.sum() * 1e-9 + center.sum() * 1e-9

    def sampler_body(key, acc):
        key, k = jax.random.split(key)
        g = sample_and_score(gen_folded, eva_folded,
                             fixed_bps + acc * 1e-12, k, n_samples,
                             sort=False)
        _, order = jax.lax.approx_max_k(g.score, 10)
        return key, acc + g.score[order[0]] * 1e-3

    def make_full_body(plane_first):
        def full_body(key, acc):
            key, k = jax.random.split(key)
            if args.family == "gan":
                g, center, n_obj_, _clip = frame_to_grasps(
                    gen_folded, eva_folded, basis, points + acc * 1e-12,
                    n_valid, k, n_samples=n_samples, top_k=10,
                    outlier_method="statistical",
                    plane_first=plane_first)
            else:
                e = deng
                g, center, n_obj_, _clip = frame_to_grasps_diffusion(
                    e.model, e.diff_params, e.eva_folded, e.normalizer,
                    basis, points + acc * 1e-12, n_valid, k,
                    n_samples=n_samples, top_k=10, steps=10,
                    guidance_scale=10.0, outlier_method="statistical",
                    plane_first=plane_first)
            return key, acc + g.score[0] * 1e-3 + center.sum() * 1e-9
        return full_body

    report = {"family": args.family, "pad_n": args.pad_n,
              "n_samples": n_samples, "iters": args.iters,
              "device": str(jax.devices()[0].device_kind)}
    times = {}
    variants = [("outlier", outlier_body), ("segment", segment_body),
                ("perception", perception_body),
                ("sampler", sampler_body),
                ("full", make_full_body(False)),
                ("full_planefirst", make_full_body(True))]
    for name, body in variants:
        t = timed(chain(body))
        times[name] = t
        report[f"{name}_ms"] = round(t * 1e3, 3)
        print(f"{name}: {t*1e3:.2f} ms", flush=True)

    report["attribution_ms"] = {
        "outlier_removal": round(times["outlier"] * 1e3, 3),
        "ransac_plane": round((times["segment"] - times["outlier"]) * 1e3,
                              3),
        "center_compact_bps": round(
            (times["perception"] - times["segment"]) * 1e3, 3),
        "sampler_standalone": round(times["sampler"] * 1e3, 3),
        "fusion_overlap": round(
            (times["perception"] + times["sampler"] - times["full"])
            * 1e3, 3),
        "plane_first_speedup": round(
            times["full"] / times["full_planefirst"], 3),
    }
    print(json.dumps(report, indent=1))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
