"""int8 (W8A8) serving study: throughput A/B vs the f32 folded path, plus
ranking/pose fidelity on trained checkpoints (engine/quant.py).

Throughput: the roofline full-pipeline body (RNG → generator → rot6d →
back-off → evaluator → approx top-k) with the wide body matmuls in
dynamic W8A8, dependency-chained in a fori_loop and materialized with
np.asarray (the only timing method that is valid through the axon
relay — CLAUDE.md).  The v5e MXU runs int8×int8→int32 at ~2× its bf16
rate, and f32 operands already run at bf16 rate (the round-2b no-op
finding), so int8 is the remaining precision rung.

Fidelity: on the trained eval_study_xl evaluator + its own eval split
(real score spread), and the trained cGAN generator's poses.

Usage (TPU, quiet machine):
    python -m dexgangrasp_tpu.tools.quant_study [--ns 4096 16384 65536]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import time

GEN_CKPT = "runs/gan_study/20000_gen_net.npz"
EVA_CKPT = "runs/eval_study_xl/300000_eva_net.npz"
XL_DIR = "/tmp/dexgg_xl"


def _chain(body):
    import jax

    @functools.partial(jax.jit, static_argnames=("k_iters",))
    def run_chain(key, k_iters):
        def step(i, carry):
            return body(*carry)
        return jax.lax.fori_loop(0, k_iters, step, (key, 0.0))[1]
    return run_chain


def _timed(chain, iters):
    import numpy as np

    import jax

    float(np.asarray(chain(jax.random.PRNGKey(0), 2)))
    best = None
    for rep in range(3):
        t0 = time.perf_counter()
        float(np.asarray(chain(jax.random.PRNGKey(rep + 1), iters)))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best / iters


def throughput(ns, iters, use_trained: bool):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dexgangrasp_tpu.core.rotations import rot_matrix_from_ortho6d
    from dexgangrasp_tpu.core.transforms import translate_along_axis
    from dexgangrasp_tpu.engine import folding, quant

    if use_trained:
        from dexgangrasp_tpu.train.checkpoints import (
            load_evaluator,
            load_gan,
        )

        gt, _ = load_gan(GEN_CKPT)
        et, _ = load_evaluator(EVA_CKPT)
        gen_folded = folding.fold_generator(gt["gen_params"],
                                            gt["gen_state"])
        eva_folded = folding.fold_evaluator(et["params"], et["state"])
    else:
        from dexgangrasp_tpu.models.networks import (
            init_dexgan,
            init_evaluator,
        )

        (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
        _, ep, es = init_evaluator(jax.random.PRNGKey(1))
        gen_folded = folding.fold_generator(gp, gs)
        eva_folded = folding.fold_evaluator(ep, es)

    gen_q = quant.quantize_folded(gen_folded)
    eva_q = quant.quantize_folded(eva_folded)
    rng = np.random.default_rng(0)
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    gctx = folding.generator_object_context(gen_folded, bps)
    ectx = folding.evaluator_object_context(eva_folded, bps)

    rows = []
    for n in ns:
        def body_f32(key, acc):
            key, k = jax.random.split(key)
            z = jax.random.normal(k, (n, 5), jnp.float32)
            r6, t, j = folding.generator_apply_folded(gen_folded, gctx, z)
            rot = rot_matrix_from_ortho6d(r6)
            t = translate_along_axis(t, rot, 0, 0.025)
            pose = jnp.concatenate([rot.reshape(n, 9), t], axis=1)
            s = folding.evaluator_apply_folded(eva_folded, ectx, pose)
            _, order = jax.lax.approx_max_k(s, 1024)
            return key, acc + s[order[0]] + t[order[0]].sum()

        def body_int8(key, acc):
            key, k = jax.random.split(key)
            z = jax.random.normal(k, (n, 5), jnp.float32)
            r6, t, j = quant.generator_apply_folded_q(gen_q, gctx, z)
            rot = rot_matrix_from_ortho6d(r6)
            t = translate_along_axis(t, rot, 0, 0.025)
            pose = jnp.concatenate([rot.reshape(n, 9), t], axis=1)
            s = quant.evaluator_apply_folded_q(eva_q, ectx, pose)
            _, order = jax.lax.approx_max_k(s, 1024)
            return key, acc + s[order[0]] + t[order[0]].sum()

        t_f32 = _timed(_chain(body_f32), iters)
        t_int8 = _timed(_chain(body_int8), iters)
        row = {"n": n,
               "f32_us_per_iter": round(t_f32 * 1e6, 1),
               "int8_us_per_iter": round(t_int8 * 1e6, 1),
               "f32_Mgrasps_per_s": round(n / t_f32 / 1e6, 2),
               "int8_Mgrasps_per_s": round(n / t_int8 / 1e6, 2),
               "speedup": round(t_f32 / t_int8, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def fidelity():
    """Trained-checkpoint fidelity block (None if ckpts/dataset absent)."""
    import numpy as np

    import jax.numpy as jnp

    if not (os.path.isfile(EVA_CKPT) and os.path.isfile(GEN_CKPT)
            and os.path.isfile(os.path.join(XL_DIR, "metadata.csv"))):
        return None
    from scipy.stats import spearmanr
    from sklearn.metrics import roc_auc_score

    from dexgangrasp_tpu.core.rotations import rot_matrix_from_ortho6d
    from dexgangrasp_tpu.data.datasets import DexEvaluatorDataSet
    from dexgangrasp_tpu.engine import folding, quant
    from dexgangrasp_tpu.train.checkpoints import load_evaluator, load_gan

    et, _ = load_evaluator(EVA_CKPT)
    eva_folded = folding.fold_evaluator(et["params"], et["state"])
    eva_q = quant.quantize_folded(eva_folded)
    ds = DexEvaluatorDataSet(XL_DIR, "eval", seed=0)
    b = ds.sample_batch(2048)
    n = b["bps_object"].shape[0]
    bps = jnp.asarray(b["bps_object"])
    pose = jnp.concatenate(
        [jnp.asarray(b["rot_matrix"].reshape(n, 9)),
         jnp.asarray(b["transl"])], axis=1).astype(jnp.float32)
    ectx = folding.evaluator_object_context(eva_folded, bps)
    s = np.asarray(folding.evaluator_apply_folded(eva_folded, ectx, pose))
    sq = np.asarray(quant.evaluator_apply_folded_q(eva_q, ectx, pose))

    gt, _ = load_gan(GEN_CKPT)
    gen_folded = folding.fold_generator(gt["gen_params"], gt["gen_state"])
    gen_q = quant.quantize_folded(gen_folded)
    rng = np.random.default_rng(3)
    gctx = folding.generator_object_context(gen_folded, bps[0])
    z = jnp.asarray(rng.normal(size=(2048, 5)).astype(np.float32))
    r6, t, _ = folding.generator_apply_folded(gen_folded, gctx, z)
    r6q, tq, _ = quant.generator_apply_folded_q(gen_q, gctx, z)
    R, Rq = rot_matrix_from_ortho6d(r6), rot_matrix_from_ortho6d(r6q)
    tr = jnp.einsum("bij,bij->b", R, Rq)
    ang = np.degrees(np.arccos(np.clip(np.asarray(tr - 1) / 2, -1, 1)))

    return {
        "eval_rows": n,
        "score_max_abs_diff": float(np.max(np.abs(s - sq))),
        "score_mean_abs_diff": float(np.mean(np.abs(s - sq))),
        "thresh_agreement_at_0.5": float(np.mean((s > 0.5) == (sq > 0.5))),
        "spearman": float(spearmanr(s, sq).statistic),
        "auc_f32": float(roc_auc_score(b["label"], s)),
        "auc_int8": float(roc_auc_score(b["label"], sq)),
        "gen_transl_max_abs_m": float(np.max(np.abs(np.asarray(t - tq)))),
        "gen_rot_max_deg": float(np.max(ang)),
    }


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="+",
                    default=[4096, 16384, 65536])
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--random-init", action="store_true",
                    help="time with random-init weights (no ckpt needed)")
    ap.add_argument("--out", default="runs/quant_study.json")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dexgg_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    use_trained = (not args.random_init) and os.path.isfile(GEN_CKPT)
    report = {"device": str(jax.devices()[0].device_kind),
              "platform": jax.devices()[0].platform,
              "trained_ckpts": use_trained,
              "throughput": throughput(args.ns, args.iters, use_trained),
              "fidelity": fidelity()}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"out": args.out, "fidelity": report["fidelity"]}))


if __name__ == "__main__":
    main()
