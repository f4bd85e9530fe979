"""Roofline / stage-attribution for the amortized serving path (VERDICT r2
weak-5 / next-4).

Counts the EXACT matmul FLOPs per grasp from the folded parameter shapes,
measures grasps/s for ablated variants of the fused pipeline (each in one
jitted fori_loop with a threaded data dependency, np.asarray-materialized),
and derives where the non-matmul time goes:

  full        — RNG → generator → rot6d+offset → evaluator → approx top-k
  no_topk     — top-k replaced by a sum-consume of the score vector
  fixed_z     — PRNG draw hoisted out (z perturbed by the accumulator)
  gen_only    — generator + rot6d (no evaluator, no top-k)
  eva_only    — evaluator on a fixed pose batch (no generator/RNG)

MFU = measured FLOP/s ÷ chip bf16 peak (the MXU multiplies f32 operands at
bf16 rate with f32 accumulate — the bf16-operand no-op finding,
docs/RESULTS.md).

Usage:
    python -m dexgangrasp_tpu.tools.roofline [--n 16384] [--iters 50]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time

# bf16 peak matmul throughput per chip (TPU v5e: 197 TFLOP/s bf16;
# f32-operand matmuls run at the same MXU rate with f32 accumulate)
PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v5e": 197e12}


def matmul_flops_per_grasp(gen_folded: dict, eva_folded: dict) -> dict:
    """Exact per-grasp matmul FLOPs (2·MACs) of the folded serving layout
    (engine/folding.py: generator_apply_folded + evaluator_apply_folded;
    the per-object context matmuls amortize to ~0)."""
    def mm(w):
        return 2 * w.shape[0] * w.shape[1]

    g = gen_folded
    gen = (mm(g["rb1"]["w1_z"]) + mm(g["rb1"]["w2"]) + mm(g["rb1"]["w3_z"])
           + mm(g["rb2"]["w1_z"]) + mm(g["rb2"]["w1_x"]) + mm(g["rb2"]["w2"])
           + mm(g["rb2"]["w3_z"]) + mm(g["rb2"]["w3_x"])
           + mm(g["rot"]["w"]) + mm(g["transl"]["w"])
           + mm(g["joint_conf"]["w"]))
    e = eva_folded
    names = [k for k in e if k.startswith("rb")]
    eva = mm(e["out"]["w"])
    for name in sorted(names):
        rb = e[name]
        eva += mm(rb["w1_pose"]) + mm(rb["w2"]) + mm(rb["w3_pose"])
        if "w1_x" in rb:
            eva += mm(rb["w1_x"]) + mm(rb["w3_x"])
    return {"generator": gen, "evaluator": eva, "total": gen + eva}


def run(n: int = 16384, iters: int = 50, top_k: int = 1024,
        out_path: str = "runs/roofline.json", bf16: bool = False):
    import numpy as np

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dexgg_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from dexgangrasp_tpu.core.rotations import rot_matrix_from_ortho6d
    from dexgangrasp_tpu.core.transforms import translate_along_axis
    from dexgangrasp_tpu.engine import folding
    from dexgangrasp_tpu.models.networks import init_dexgan, init_evaluator

    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    gen_folded = folding.fold_generator(gp, gs)
    eva_folded = folding.fold_evaluator(ep, es)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    if bf16:  # bf16 serving mode (VERDICT r4 #4): halve the HBM traffic
        gen_folded = folding.cast_folded(gen_folded, dt)
        eva_folded = folding.cast_folded(eva_folded, dt)
    rng = np.random.default_rng(0)
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32)).astype(dt)
    gctx = folding.generator_object_context(gen_folded, bps)
    ectx = folding.evaluator_object_context(eva_folded, bps)
    fixed_z = jax.random.normal(jax.random.PRNGKey(9), (n, 5),
                                jnp.float32).astype(dt)
    fixed_pose = jnp.asarray(
        rng.normal(size=(n, 12)).astype(np.float32) * 0.1).astype(dt)

    def gen_tail(z):
        rot6, transl, joints = folding.generator_apply_folded(
            gen_folded, gctx, z)
        # f32 island: Gram-Schmidt + palm back-off
        rot = rot_matrix_from_ortho6d(rot6.astype(jnp.float32))
        transl = translate_along_axis(transl.astype(jnp.float32), rot,
                                      0, 0.025)
        return rot, transl, joints

    def make_pose(rot, transl):
        return jnp.concatenate([rot.reshape(n, 9), transl],
                               axis=1).astype(dt)

    def score_of(pose):
        return folding.evaluator_apply_folded(eva_folded, ectx,
                                              pose).astype(jnp.float32)

    def full_body(key, acc):
        key, k = jax.random.split(key)
        z = jax.random.normal(k, (n, 5), jnp.float32).astype(dt)
        rot, transl, joints = gen_tail(z)
        score = score_of(make_pose(rot, transl))
        _, order = jax.lax.approx_max_k(score, top_k)
        return key, (acc + score[order[0]] + transl[order[0]].sum()
                     + rot[order[0]].sum()
                     + joints[order[0]].sum().astype(jnp.float32))

    def no_topk_body(key, acc):
        key, k = jax.random.split(key)
        z = jax.random.normal(k, (n, 5), jnp.float32).astype(dt)
        rot, transl, joints = gen_tail(z)
        score = score_of(make_pose(rot, transl))
        return key, acc + score.sum() * 1e-6

    def fixed_z_body(key, acc):
        z = fixed_z + (acc * 1e-12).astype(dt)
        rot, transl, joints = gen_tail(z)
        score = score_of(make_pose(rot, transl))
        _, order = jax.lax.approx_max_k(score, top_k)
        return key, (acc + score[order[0]] + transl[order[0]].sum())

    def gen_only_body(key, acc):
        key, k = jax.random.split(key)
        z = jax.random.normal(k, (n, 5), jnp.float32).astype(dt)
        rot, transl, joints = gen_tail(z)
        return key, (acc + rot.sum() * 1e-9 + transl.sum() * 1e-9
                     + joints.sum().astype(jnp.float32) * 1e-9)

    def eva_only_body(key, acc):
        score = score_of(fixed_pose + (acc * 1e-12).astype(dt))
        return key, acc + score.sum() * 1e-9

    def chain(body):
        @functools.partial(jax.jit, static_argnames=("k_iters",))
        def run_chain(key, k_iters):
            def step(i, carry):
                return body(*carry)
            return jax.lax.fori_loop(0, k_iters, step, (key, 0.0))[1]
        return run_chain

    def timed(c):
        float(np.asarray(c(jax.random.PRNGKey(0), 2)))
        best = None
        for rep in range(3):
            t0 = time.perf_counter()
            float(np.asarray(c(jax.random.PRNGKey(rep + 1), iters)))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best / iters  # seconds per pipeline iteration

    flops = matmul_flops_per_grasp(gen_folded, eva_folded)
    report = {"n": n, "iters": iters, "top_k": top_k, "bf16": bf16,
              "device": str(jax.devices()[0].device_kind),
              "flops_per_grasp": flops}

    times = {}
    for name, body in (("full", full_body), ("no_topk", no_topk_body),
                       ("fixed_z", fixed_z_body),
                       ("gen_only", gen_only_body),
                       ("eva_only", eva_only_body)):
        t = timed(chain(body))
        times[name] = t
        report[f"{name}_us_per_iter"] = round(t * 1e6, 1)
        report[f"{name}_grasps_per_sec"] = round(n / t, 1)
        print(f"{name}: {t*1e6:.0f} us/iter = {n/t/1e6:.2f} M grasps/s",
              flush=True)

    # stage attribution (differences of ablations; negative ⇒ fused away)
    report["attribution_us"] = {
        "topk": round((times["full"] - times["no_topk"]) * 1e6, 1),
        "rng": round((times["full"] - times["fixed_z"]) * 1e6, 1),
        "evaluator_plus_concat": round(
            (times["no_topk"] - times["gen_only"]) * 1e6, 1),
        "eva_only_floor": round(times["eva_only"] * 1e6, 1),
    }

    peak = next((v for k, v in PEAK_FLOPS.items()
                 if str(jax.devices()[0].device_kind).startswith(k)), None)
    if peak:
        achieved = flops["total"] * n / times["full"]
        report["achieved_matmul_tflops"] = round(achieved / 1e12, 2)
        report["peak_tflops"] = peak / 1e12
        report["mfu"] = round(achieved / peak, 4)
        print(f"MFU: {report['mfu']*100:.1f}% "
              f"({report['achieved_matmul_tflops']} / {peak/1e12} TFLOP/s)")

    print(json.dumps(report, indent=1))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 serving mode (folded weights + activations "
                         "in bf16, f32 islands for rot6d/back-off/top-k)")
    ap.add_argument("--out", default="runs/roofline.json")
    args = ap.parse_args()
    run(n=args.n, iters=args.iters, out_path=args.out, bf16=args.bf16)


if __name__ == "__main__":
    main()
