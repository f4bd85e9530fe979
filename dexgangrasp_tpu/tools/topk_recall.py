"""approx_max_k recall on TRAINED weights (VERDICT r2 weak-7).

Serving uses ``jax.lax.approx_max_k`` (recall target ~0.95 per element);
with a trained evaluator whose top-10 drives a physical pick, what matters
is (a) top-10 set recall vs exact top-k and (b) whether the TRUE best
grasp survives into the served set.  Measured per object over many
objects/seeds, on the serving shapes (n=10000 → top-10).

Run ON TPU: the approximation is the TPU PartialReduce op; other backends
fall back to exact top-k and report recall 1.0 vacuously.

Usage:
    python -m dexgangrasp_tpu.tools.topk_recall \
        --gen runs/gan_study/20000_gen_net.npz \
        --eva runs/eval_study_xl/300000_eva_net.npz
"""
from __future__ import annotations

import argparse
import json
import os


def run(gen_ckpt: str, eva_ckpt: str, n: int = 10000, top_k: int = 10,
        n_objects: int = 64, out_path: str = "runs/topk_recall.json"):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dexgangrasp_tpu.engine import folding
    from dexgangrasp_tpu.engine.pipeline import sample_and_score
    from dexgangrasp_tpu.train.checkpoints import load_evaluator, load_gan

    gt, _ = load_gan(gen_ckpt)
    et, _ = load_evaluator(eva_ckpt)
    gen_folded = folding.fold_generator(gt["gen_params"], gt["gen_state"])
    eva_folded = folding.fold_evaluator(et["params"], et["state"])

    @jax.jit
    def both_topk(bps, key):
        g = sample_and_score(gen_folded, eva_folded, bps, key, n,
                             sort=False)
        _, approx = jax.lax.approx_max_k(g.score, top_k)
        _, exact = jax.lax.top_k(g.score, top_k)
        return approx, exact, g.score

    rng = np.random.default_rng(0)
    recalls, best_kept, score_gap = [], [], []
    for i in range(n_objects):
        bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
        approx, exact, score = jax.device_get(
            both_topk(bps, jax.random.PRNGKey(i)))
        a, e = set(approx.tolist()), set(exact.tolist())
        recalls.append(len(a & e) / top_k)
        best_kept.append(exact[0] in a)
        # worst case served score vs true top-k floor
        score_gap.append(float(score[exact].min() - score[approx].min()))
    report = {
        "n": n, "top_k": top_k, "n_objects": n_objects,
        "device": str(jax.devices()[0].device_kind),
        "platform": jax.devices()[0].platform,
        "recall_at_10_mean": float(np.mean(recalls)),
        "recall_at_10_min": float(np.min(recalls)),
        "true_best_in_served_rate": float(np.mean(best_kept)),
        "served_floor_score_gap_max": float(np.max(score_gap)),
        "gen_ckpt": gen_ckpt, "eva_ckpt": eva_ckpt,
    }

    # The cGAN is mode-collapsed (docs/RESULTS.md): thousands of near-
    # identical grasps tie on score, making INDEX recall meaningless there
    # (the score-gap metric is the operational one).  The diffusion
    # generator has real spread — measure index recall where it means
    # something.
    diff_ckpt = "runs/diffusion_xl/40000_diffusion_net.npz"
    if os.path.isfile(diff_ckpt):
        from dexgangrasp_tpu.engine.diffusion_pipeline import (
            sample_and_topk_diffusion,
        )
        from dexgangrasp_tpu.models.diffusion import (
            DexDiffuser,
            GraspNormalizer,
        )
        from dexgangrasp_tpu.train.checkpoints import load_pytrees

        trees, _ = load_pytrees(diff_ckpt)
        model = DexDiffuser()
        norm = GraspNormalizer(mean=trees["normalizer_mean"],
                               std=trees["normalizer_std"])

        @jax.jit
        def diff_both(bps, key):
            ga = sample_and_topk_diffusion(model, trees["params"],
                                           eva_folded, norm, bps, key,
                                           1000, top_k, steps=10)
            ge = sample_and_topk_diffusion(model, trees["params"],
                                           eva_folded, norm, bps, key,
                                           1000, top_k, steps=10,
                                           exact=True)
            return ga.score, ge.score

        dvec, dgaps = [], []
        for i in range(min(n_objects, 32)):
            bps = jnp.asarray(
                rng.uniform(0, 0.2, 4096).astype(np.float32))
            sa, se = jax.device_get(diff_both(bps, jax.random.PRNGKey(i)))
            # same key → identical candidate set.  Scores saturate near
            # 1.0 on guided/filtered sets, so INDEX sets are tie-fragile;
            # the operational questions are (a) does the served top-10's
            # score VECTOR match exact top-10, (b) is the served floor
            # ever below the exact floor.
            dvec.append(float(np.max(np.abs(np.sort(sa) - np.sort(se)))))
            dgaps.append(float(se.min() - sa.min()))
        report["diffusion_topk_score_vec_max_diff"] = float(np.max(dvec))
        report["diffusion_served_floor_score_gap_max"] = float(
            np.max(dgaps))
    print(json.dumps(report, indent=1))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen", default="runs/gan_study/20000_gen_net.npz")
    ap.add_argument("--eva",
                    default="runs/eval_study_xl/300000_eva_net.npz")
    ap.add_argument("--n", type=int, default=10000)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--n-objects", type=int, default=64)
    ap.add_argument("--out", default="runs/topk_recall.json")
    args = ap.parse_args()
    run(args.gen, args.eva, n=args.n, top_k=args.top_k,
        n_objects=args.n_objects, out_path=args.out)


if __name__ == "__main__":
    main()
