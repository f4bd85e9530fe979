"""Train + evaluate the learned part segmenter (models/partseg.py) — the
TPU-native replacement for the reference's VLPart stage.

The reference vendors VLPart + detectron2 and calls ``run_lmp(color)``
live (`/root/reference/dexafford_prompt.py:20,149-156`); this repo's
affordance *quality* loop was closed in round 5 with a geometric part
oracle (tools/afford_study.py), but the online path still segmented with
a stub.  This study trains a real model on shaded renders of the same
oracle scenes and measures, end to end:

1. **Mask quality** — IoU / precision / recall at full camera resolution
   on held-out scenes.
2. **Downstream grasp targeting** — the full offline affordance path
   (`run_afford_offline`) run twice per eval scene, once with the ORACLE
   mask and once with the LEARNED mask, plus the unranked baseline; all
   three selections scored with the geometric gripper oracle
   (part-hit-rate / oracle success / distance-to-part).  The gap between
   learned-mask and oracle-mask rows is the price of swapping VLPart for
   this 1.6M-param net on these scenes.

Shading: color frames are rendered from the z-buffered depth with a
random light, per-scene albedos, textured background, and sensor noise —
the part label NEVER enters the shading, so the net must infer the part
from appearance/shape like VLPart does.

Usage:
    python -m dexgangrasp_tpu.tools.partseg_study \
        --n-train 192 --n-eval 32 --steps 3000 --out runs/partseg_study \
        --e2e --gen runs/flagship_4x/30000_vae_net.npz \
        --eva runs/flagship_4x/60000_eva_net.npz \
        --basis /tmp/dexgg_4x/basis_point_set.npy --model vae
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from dexgangrasp_tpu.tools.afford_study import (
    make_part_object,
    render_scene,
    save_frame,
    score_selection,
)

HW = (720, 1280)


# ------------------------------------------------------------ shading

def densify_zbuffer(depth: np.ndarray, mask: np.ndarray, max_px: int = 4
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Fill gaps in the point-splatted z-buffer by bounded nearest-pixel
    assignment (depth and part flag move together, so the mask stays
    exactly consistent with the depth).

    render_scene z-buffers a 4096-point surface *sample* — at 720p the
    object is a dot cloud with ~3 px gaps, unlike the dense frames a
    RealSense returns.  Filling each empty pixel within ``max_px`` of an
    occupied one from its nearest occupied pixel produces the solid
    silhouettes the segmenter (and the shading) should see.
    """
    from scipy import ndimage

    empty = depth <= 0
    dist, (iy, ix) = ndimage.distance_transform_edt(
        empty, return_indices=True)
    take = empty & (dist <= max_px)
    depth2 = depth.copy()
    mask2 = mask.copy()
    depth2[take] = depth[iy[take], ix[take]]
    mask2[take] = mask[iy[take], ix[take]]
    return depth2, mask2

def shade_frame(depth: np.ndarray, rng: np.random.Generator,
                ) -> np.ndarray:
    """Z-buffered depth (mm, 0 = background) → synthetic color frame.

    Lambertian shading from depth-gradient normals + random light, random
    object/background albedos, low-frequency background texture, and
    Gaussian sensor noise.  Uses ONLY the depth map — part labels never
    leak into appearance.
    """
    H, W = depth.shape
    obj = depth > 0

    z = depth.astype(np.float32) / 1000.0
    # fill background with a far plane so gradients at the silhouette are
    # large (strong edges, like a real depth discontinuity under shading)
    zf = np.where(obj, z, z[obj].mean() if obj.any() else 1.0)
    gy, gx = np.gradient(zf)
    n = np.stack([-gx, -gy, np.full_like(zf, 2e-3)], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12

    light = rng.normal(size=3)
    light[2] = -abs(light[2]) - 0.5  # toward the camera
    light /= np.linalg.norm(light)
    lam = np.clip((n @ (-light)), 0.0, 1.0)

    alb_obj = rng.uniform(0.35, 0.9, size=3)
    alb_bg = rng.uniform(0.15, 0.6, size=3)
    # low-frequency background texture (kron-upsampled coarse noise)
    coarse = rng.uniform(0.6, 1.4, size=(-(-H // 48), -(-W // 64)))
    tex = np.kron(coarse, np.ones((48, 64)))[:H, :W]

    img = np.empty((H, W, 3), np.float32)
    shade = (0.25 + 0.75 * lam)[..., None]
    img[:] = np.where(obj[..., None],
                      shade * alb_obj,
                      (0.3 + 0.4 * tex[..., None]) * alb_bg)
    img += rng.normal(scale=0.02, size=img.shape)
    return (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)


# ----------------------------------------------------------- dataset

def build_scenes(n_scenes: int, seed: int, keep_full: bool,
                 cam_dist: float = 0.55, part_quantile: float = 0.72,
                 taper: Tuple[float, float] = (0.25, 0.55)
                 ) -> List[Dict]:
    """Render n oracle scenes into (color, mask[, geometry]) dicts.

    Scenes draw a per-object ``taper`` from the given range so the part
    end is the geometrically narrow one: the symmetric superquadric's
    two caps are congruent, which makes "which end is the part" exactly
    a coin flip for any appearance model (see make_part_object) — the
    measured symptom was bimodal per-scene IoU (~0 on wrong-end scenes,
    ~0.5 on right-end ones).  Pass ``taper=(0, 0)`` to reproduce the
    ill-posed symmetric protocol.

    Intrinsics are the rig's (apps/afford_offline.DEFAULT_INTRINSICS),
    scaled when the module-level ``HW`` is overridden below 720×1280
    (tests use a quarter-res frame).  e2e_compare feeds frames back
    through run_afford_offline, which assumes the rig intrinsics — so
    keep ``HW`` at the default for end-to-end runs."""
    from dexgangrasp_tpu.apps.afford_offline import DEFAULT_INTRINSICS

    H, W = HW
    sy, sx = H / 720.0, W / 1280.0
    intr = dict(fx=DEFAULT_INTRINSICS["fx"] * sx,
                fy=DEFAULT_INTRINSICS["fy"] * sy,
                cx=DEFAULT_INTRINSICS["cx"] * sx,
                cy=DEFAULT_INTRINSICS["cy"] * sy)
    min_part = max(8, int(40 * sx * sy))
    rng = np.random.default_rng(seed)
    out: List[Dict] = []
    while len(out) < n_scenes:
        tp = float(rng.uniform(*taper)) if taper[1] > 0 else 0.0
        cloud_obj, part = make_part_object(rng,
                                           part_quantile=part_quantile,
                                           taper=tp)
        scene = render_scene(cloud_obj, part, rng, intrinsics=intr, hw=HW,
                             cam_dist=cam_dist, min_part_pixels=min_part)
        if scene is None:
            continue
        depth_d, mask_d = densify_zbuffer(scene["depth"], scene["mask"])
        color = shade_frame(depth_d, rng)
        rec = {"color": color, "mask": mask_d}
        if keep_full:
            rec.update(depth=depth_d, points=scene["points"],
                       full_cam=scene["full_cam"],
                       part_cam=scene["part_cam"])
        out.append(rec)
    return out


def scenes_to_arrays(scenes: List[Dict], pool: Optional[int] = None
                     ) -> Tuple[np.ndarray, np.ndarray]:
    from dexgangrasp_tpu.models.partseg import (
        POOL, downsample_frame, downsample_label)

    pool = pool or POOL
    imgs, labels = [], []
    for s in scenes:
        img, _ = downsample_frame(s["color"], pool=pool)
        imgs.append(img)
        labels.append(downsample_label(s["mask"], pool=pool))
    return np.stack(imgs), np.stack(labels)


# ----------------------------------------------------------- training

def _augment_batch(key, imgs, labels):
    """On-device per-sample augmentation inside the jitted train chunk:
    horizontal/vertical flips (scenes have random camera roll, so both
    are label-preserving) + per-sample/channel photometric jitter."""
    import jax
    import jax.numpy as jnp

    def one(key, img, lab):
        kh, kv, kg, kb = jax.random.split(key, 4)
        fh = jax.random.bernoulli(kh)
        img = jnp.where(fh, img[:, ::-1], img)
        lab = jnp.where(fh, lab[:, ::-1], lab)
        fv = jax.random.bernoulli(kv)
        img = jnp.where(fv, img[::-1], img)
        lab = jnp.where(fv, lab[::-1], lab)
        # dtype pinned: under x64 (the test mesh) jax.random defaults to
        # f64, which would promote the f32 images and break the f32 convs
        gain = jax.random.uniform(kg, (1, 1, 3), dtype=img.dtype,
                                  minval=0.7, maxval=1.3)
        bias = jax.random.uniform(kb, (1, 1, 3), dtype=img.dtype,
                                  minval=-0.08, maxval=0.08)
        return jnp.clip(img * gain + bias, 0.0, 1.0), lab

    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(one)(keys, imgs, labels)


def train_partseg(imgs: np.ndarray, labels: np.ndarray, steps: int,
                  batch_size: int = 16, lr: float = 3e-4,
                  width: int = 24, seed: int = 0,
                  log_every: int = 200, inner: int = 20,
                  augment: bool = True):
    """Scan-chunked training: ``inner`` optimizer steps per device
    dispatch (the axon relay costs ~35-150 ms per dispatched program —
    CLAUDE.md — so stepwise host loops are relay-bound, not compute-
    bound; same device-resident pattern as train/fast.py)."""
    import jax
    import jax.numpy as jnp
    import optax

    from dexgangrasp_tpu.models.partseg import partseg_init, partseg_loss

    key = jax.random.PRNGKey(seed)
    params = partseg_init(key, width=width)
    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.05)
    opt = optax.adamw(sched, weight_decay=1e-4)
    opt_state = opt.init(params)

    # tables enter as jit ARGUMENTS, not closure constants: closed-over
    # arrays are baked into the compile payload, and at pool=4 the
    # 768-scene image table (~540 MB) exceeds the axon relay's
    # remote_compile request limit (HTTP 413); as arguments they ride as
    # device-buffer handles.
    d_imgs = jax.device_put(jnp.asarray(imgs))
    d_labels = jax.device_put(jnp.asarray(labels))
    inner = max(1, min(inner, steps))

    @jax.jit
    def chunk(params, opt_state, key, d_imgs, d_labels):
        def body(carry, _):
            params, opt_state, key = carry
            key, ki, ka = jax.random.split(key, 3)
            idx = jax.random.randint(ki, (batch_size,), 0,
                                     d_imgs.shape[0])
            bi, bl = d_imgs[idx], d_labels[idx]
            if augment:
                bi, bl = _augment_batch(ka, bi, bl)
            loss, grads = jax.value_and_grad(partseg_loss)(params, bi, bl)
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state,
                    key), loss
        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), None, length=inner)
        return params, opt_state, key, losses.mean()

    t0 = time.time()
    done = 0
    while done < steps:
        params, opt_state, key, loss = chunk(params, opt_state, key,
                                             d_imgs, d_labels)
        done += inner
        if log_every and (done // inner) % max(1, log_every // inner) == 0:
            print(f"step {done}: loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)")
    return params


# --------------------------------------------------------------- eval

def predict_mask(params, color: np.ndarray, threshold: float = 0.5,
                 pool: Optional[int] = None) -> np.ndarray:
    """Full-res bool mask from a color frame (host resize + one forward).

    Same path the production segmenter uses
    (apps/lmp_client.PartSegSegmenter)."""
    from dexgangrasp_tpu.apps.lmp_client import PartSegSegmenter

    seg = _SEG_CACHE.get(id(params))
    if seg is None or seg.threshold != threshold or (
            pool and seg.pool != pool):
        seg = PartSegSegmenter(params, threshold=threshold, pool=pool)
        _SEG_CACHE[id(params)] = seg
    return seg(color)


_SEG_CACHE: Dict = {}


def mask_metrics(pred: np.ndarray, gt: np.ndarray) -> Dict:
    inter = float((pred & gt).sum())
    union = float((pred | gt).sum())
    return {
        "iou": inter / max(union, 1.0),
        "precision": inter / max(float(pred.sum()), 1.0),
        "recall": inter / max(float(gt.sum()), 1.0),
    }


def eval_masks(params, scenes: List[Dict],
               pool: Optional[int] = None) -> Dict:
    rows = [mask_metrics(predict_mask(params, s["color"], pool=pool),
                         s["mask"])
            for s in scenes]
    return {k: round(float(np.mean([r[k] for r in rows])), 4)
            for k in rows[0]}


# --------------------------------------------------- end-to-end compare

def e2e_compare(engine, params, scenes: List[Dict], n_samples: int,
                top_k: int, final_k: int, seed: int,
                workdir: str, pool: Optional[int] = None) -> Dict:
    """Oracle-mask vs learned-mask vs unranked through the full
    offline affordance path, oracle-scored (afford_study protocol)."""
    from dexgangrasp_tpu.apps.afford_offline import run_afford_offline

    rows = []
    for si, s in enumerate(scenes):
        learned = predict_mask(params, s["color"], pool=pool)
        variants = {"oracle": s["mask"], "learned": learned}
        row: Dict = {"scene": si,
                     "mask_iou": mask_metrics(learned, s["mask"])["iou"],
                     "learned_pixels": int(learned.sum())}
        res_ref = None
        for tag, mask in variants.items():
            frame_dir = os.path.join(workdir, f"s{si:04d}_{tag}")
            save_frame({"depth": s["depth"], "mask": mask,
                        "points": s["points"]}, frame_dir)
            res = run_afford_offline(engine, frame_dir, "0000",
                                     n_samples=n_samples, top_k=top_k,
                                     seed=seed + 1000 + si)
            pc_center = res["pc_center"]
            full_centered = s["full_cam"] - pc_center.reshape(1, 3)
            sel = {k: np.asarray(v)[:final_k]
                   for k, v in res["grasps"].items()
                   if isinstance(v, (np.ndarray, list)) and k != "n_valid"}
            # targeting is always judged against the ORACLE part
            oracle_centroid = full_centered[s["part_cam"]].mean(axis=0)
            row[tag] = score_selection(tag, sel, full_centered,
                                       s["part_cam"], oracle_centroid)
            row[tag]["n_part_points"] = int(res["n_part_points"])
            if tag == "oracle":
                res_ref = res
        # unranked baseline: same candidate draw, evaluator sort only
        pc_center = res_ref["pc_center"]
        centered_vis = s["points"] - pc_center.reshape(1, 3)
        bps = np.asarray(engine.encode_pcd(centered_vis))
        g_all = engine.generate_grasps(bps, n_samples, seed=seed + 1000 + si)
        base = engine.filter_grasps(bps, g_all, thresh=-1.0)
        base = {k: np.asarray(v)[:final_k] for k, v in base.items()
                if isinstance(v, (np.ndarray, list)) and k != "n_valid"}
        full_centered = s["full_cam"] - pc_center.reshape(1, 3)
        oracle_centroid = full_centered[s["part_cam"]].mean(axis=0)
        row["unranked"] = score_selection("unranked", base, full_centered,
                                          s["part_cam"], oracle_centroid)
        rows.append(row)
        print(f"scene {si}: iou={row['mask_iou']:.2f} "
              f"hit oracle={row['oracle']['part_hit_rate']:.2f} "
              f"learned={row['learned']['part_hit_rate']:.2f} "
              f"unranked={row['unranked']['part_hit_rate']:.2f}")

    agg: Dict = {"n_scenes": len(rows),
                 "mask_iou": round(float(np.mean(
                     [r["mask_iou"] for r in rows])), 4)}
    for side in ("oracle", "learned", "unranked"):
        for key in ("part_hit_rate", "part_contact_frac", "success_rate",
                    "dist_to_part_m"):
            agg[f"{side}_{key}"] = round(
                float(np.mean([r[side][key] for r in rows])), 4)
    return {"aggregate": agg, "scenes": rows}


# --------------------------------------------------------------- main

def main(argv: Optional[list] = None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=192)
    ap.add_argument("--n-eval", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--width", type=int, default=24)
    ap.add_argument("--pool", type=int, default=None,
                    help="working-resolution decimation factor "
                    "(default models/partseg.POOL = 8; 4 doubles the "
                    "working res and lifts the upsampling IoU ceiling "
                    "0.68 -> 0.78)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--taper-min", type=float, default=0.25)
    ap.add_argument("--taper-max", type=float, default=0.55,
                    help="0 0 = the symmetric (provably end-ambiguous) "
                    "control protocol")
    ap.add_argument("--out", default="runs/partseg_study")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ckpt", default=None,
                    help="load a trained partseg checkpoint instead of "
                    "training (skips scene/train phases except eval)")
    # end-to-end affordance comparison (needs engine checkpoints)
    ap.add_argument("--e2e", action="store_true")
    ap.add_argument("--gen", default="runs/flagship_4x/30000_vae_net.npz")
    ap.add_argument("--eva", default="runs/flagship_4x/60000_eva_net.npz")
    ap.add_argument("--basis", default="/tmp/dexgg_4x/basis_point_set.npy")
    ap.add_argument("--model", default="vae")
    ap.add_argument("--n-samples", type=int, default=400)
    ap.add_argument("--top-k", type=int, default=30)
    ap.add_argument("--final-k", type=int, default=10)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # first compile of the train chunk through the relay is ~10 min;
        # persist it like the bench tools do
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/dexgg_jax_cache")

    t0 = time.time()
    taper = (args.taper_min, args.taper_max)
    eval_scenes = build_scenes(args.n_eval, args.seed + 7777,
                               keep_full=True, taper=taper)
    os.makedirs(args.out, exist_ok=True)
    if args.ckpt:
        from dexgangrasp_tpu.train.checkpoints import load_pytrees

        trees, meta = load_pytrees(args.ckpt)
        params = trees["params"]
        pool = args.pool or int(meta.get("pool", 0)) or None
        print(f"loaded {args.ckpt}; eval scenes in {time.time() - t0:.0f}s")
    else:
        pool = args.pool
        print(f"building {args.n_train}+{args.n_eval} scenes ...")
        train_scenes = build_scenes(args.n_train, args.seed,
                                    keep_full=False, taper=taper)
        imgs, labels = scenes_to_arrays(train_scenes, pool=pool)
        print(f"scenes built in {time.time() - t0:.0f}s; "
              f"train imgs {imgs.shape}, part frac "
              f"{labels.mean():.4f}")
        params = train_partseg(imgs, labels, args.steps, args.batch_size,
                               args.lr, args.width, args.seed)

    report: Dict = {"config": vars(args).copy(),
                    "mask_eval": eval_masks(params, eval_scenes,
                                            pool=pool)}
    print("held-out mask metrics:", report["mask_eval"])

    if not args.ckpt:
        from dexgangrasp_tpu.models.partseg import POOL
        from dexgangrasp_tpu.train.checkpoints import save_pytrees

        ckpt = os.path.join(args.out, f"{args.steps}_partseg_net.npz")
        save_pytrees(ckpt, {"params": params},
                     meta={"kind": "partseg", "width": args.width,
                           "steps": args.steps, "pool": pool or POOL})
        print("saved", ckpt)

    if args.e2e:
        from dexgangrasp_tpu.cli import load_engine

        engine = load_engine(args.gen, args.eva, args.basis,
                             model=args.model)
        with tempfile.TemporaryDirectory(prefix="partseg_e2e_") as wd:
            report["e2e"] = e2e_compare(
                engine, params, eval_scenes, args.n_samples, args.top_k,
                args.final_k, args.seed, wd, pool=pool)
        a = report["e2e"]["aggregate"]
        print("\n| selection | part-hit | part-contact | success | "
              "dist-to-part (m) |")
        print("|---|---|---|---|---|")
        for side in ("oracle", "learned", "unranked"):
            print(f"| {side} | {a[side + '_part_hit_rate']:.3f} "
                  f"| {a[side + '_part_contact_frac']:.3f} "
                  f"| {a[side + '_success_rate']:.3f} "
                  f"| {a[side + '_dist_to_part_m']:.4f} |")

    path = os.path.join(args.out,
                        "report_e2e.json" if args.ckpt else "report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
