#!/usr/bin/env python3
"""Benchmark: generated+scored grasps/sec on one chip + cold-object latency.

The BASELINE.json north-star workload: per object, encode-once →
sample-N → generator → evaluator-score → top-k, all in one fused XLA
program.  Baseline target: 10,000 grasps/sec/chip.

Methodology: K pipeline iterations run *inside one jitted fori_loop* with a
data dependency threaded through (each iteration's result feeds a scalar
accumulator that is materialized to host at the end), so asynchronous
dispatch cannot fake completion — the wall clock covers real device
execution of K × N grasps.

Prints ONE JSON line.  Primary metric: amortized grasps/s (one object
context, many sample batches).  Extra keys (VERDICT r1 next-2/next-9):

- cold_object_ms / cold_object_ms_pallas: per-NEW-object serving cost —
  BPS-encode an 8192-pt cloud + fold the object context + sample 1000
  grasps + score + top-10, one fused program (the offline app's shape,
  reference dexgangrasp_offline.py:99), XLA vs Pallas BPS kernel.
- bps_encode_ms{,_pallas}: the raw encode stage alone.
- pallas_max_abs_diff: on-hardware numerics check of the Pallas kernel
  against the blocked-XLA path.
"""
import json
import sys
import time

import numpy as np

N_GRASPS = 16384   # grasps per pipeline iteration
TOP_K = 1024       # approx top-k returned per iteration
INNER_ITERS = 50   # pipeline iterations per timed program
BASELINE = 10000.0
COLD_OBJECTS = 32  # distinct clouds per cold-object timing chain
CLOUD_PAD = 8192


def _probe_backend(timeout_s: float = 90.0) -> bool:
    """Bounded backend check: the axon relay can go UNAVAILABLE and then
    ``jax.devices()`` HANGS instead of raising — bound the wait rather than
    hanging the driver.  jax.devices() memoizes per-process, so each probe
    runs in a fresh subprocess; a hung child is killed, not joined."""
    import subprocess

    try:
        rc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True).returncode
        return rc == 0
    except subprocess.TimeoutExpired:
        return False


def _probe_backend_with_retry(total_s: float = 300.0,
                              probe_s: float = 90.0) -> bool:
    """Ride out a TRANSIENT relay outage (VERDICT r3 next-1): re-probe with
    backoff for up to ``total_s`` before giving up.  A void round artifact
    costs far more than a few minutes of driver time."""
    deadline = time.time() + total_s
    delay = 5.0
    attempt = 0
    while True:
        attempt += 1
        remaining = deadline - time.time()
        if remaining <= 0:
            return False
        if _probe_backend(min(probe_s, remaining)):
            return True
        print(f"backend probe attempt {attempt} failed; "
              f"{remaining:.0f}s left in retry window", file=sys.stderr)
        time.sleep(min(delay, max(0.0, deadline - time.time())))
        delay = min(delay * 2, 40.0)


def _warm_backend_bounded(timeout_s: float = 240.0) -> bool:
    """Memoize jax.devices() in THIS process with a bounded wait, so a
    relay drop between the subprocess probe and the parent's first device
    use can't hang the driver (the hang moves here, where it's bounded)."""
    import threading

    ok = []

    def warm():
        try:
            import jax

            jax.devices()
            ok.append(True)
        except Exception:
            pass

    t = threading.Thread(target=warm, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    import functools

    if not _probe_backend_with_retry() or not _warm_backend_bounded():
        print(json.dumps({
            "error": "accelerator backend unreachable (axon relay outage,"
                     " retried ~5 min) — no measurement taken; see runs/ +"
                     " docs/RESULTS.md for the last recorded numbers"}),
              file=sys.stderr)
        sys.exit(2)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/dexgg_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from dexgangrasp_tpu.core.rotations import rot_matrix_from_ortho6d
    from dexgangrasp_tpu.core.transforms import translate_along_axis
    from dexgangrasp_tpu.engine import folding
    from dexgangrasp_tpu.models.networks import init_dexgan, init_evaluator

    (_, gp, gs), _ = init_dexgan(jax.random.PRNGKey(0))
    _, ep, es = init_evaluator(jax.random.PRNGKey(1))
    gen_folded = folding.fold_generator(gp, gs)
    eva_folded = folding.fold_evaluator(ep, es)

    rng = np.random.default_rng(0)
    bps = jnp.asarray(rng.uniform(0, 0.2, 4096).astype(np.float32))
    n = N_GRASPS

    # bf16 serving mode (VERDICT r4 #4): the folded 512-wide chain is
    # HBM-bound in f32 at serving batch; bf16 operands halve the traffic.
    # f32 islands: rot6d Gram-Schmidt + z-offset + top-k ordering.
    gen_bf16 = folding.cast_folded(gen_folded, jnp.bfloat16)
    eva_bf16 = folding.cast_folded(eva_folded, jnp.bfloat16)

    def make_pipeline_chain(use_chain_kernel, bf16: bool = False):
        gf = gen_bf16 if bf16 else gen_folded
        ef = eva_bf16 if bf16 else eva_folded

        @functools.partial(jax.jit, static_argnames=("iters",))
        def pipeline_chain(key, iters):
            gctx = folding.generator_object_context(
                gf, bps.astype(jnp.bfloat16) if bf16 else bps)
            ectx = folding.evaluator_object_context(
                ef, bps.astype(jnp.bfloat16) if bf16 else bps)

            def body(i, carry):
                key, acc = carry
                key, k = jax.random.split(key)
                z = jax.random.normal(k, (n, 5), jnp.float32)
                if use_chain_kernel:
                    from dexgangrasp_tpu.ops.grasp_chain import (
                        grasp_chain_pallas,
                    )

                    rot, transl, joints, score = grasp_chain_pallas(
                        gen_folded, eva_folded, gctx, ectx, z,
                        z_offset=0.025, tile=1024)
                elif bf16:
                    rot6, transl, joints = folding.generator_apply_folded(
                        gf, gctx, z.astype(jnp.bfloat16))
                    # f32 island: Gram-Schmidt + palm back-off
                    rot = rot_matrix_from_ortho6d(rot6.astype(jnp.float32))
                    transl = translate_along_axis(
                        transl.astype(jnp.float32), rot, 0, 0.025)
                    pose = jnp.concatenate([rot.reshape(n, 9), transl],
                                           axis=1).astype(jnp.bfloat16)
                    score = folding.evaluator_apply_folded(
                        ef, ectx, pose).astype(jnp.float32)
                else:
                    rot6, transl, joints = folding.generator_apply_folded(
                        gen_folded, gctx, z)
                    rot = rot_matrix_from_ortho6d(rot6)
                    transl = translate_along_axis(transl, rot, 0, 0.025)
                    pose = jnp.concatenate([rot.reshape(n, 9), transl],
                                           axis=1)
                    score = folding.evaluator_apply_folded(eva_folded, ectx,
                                                           pose)
                _, order = jax.lax.approx_max_k(score, TOP_K)
                # consume every output so nothing is dead-code-eliminated
                acc = (acc + score[order[0]] + transl[order[0]].sum()
                       + rot[order[0]].sum() + joints[order[0]].sum())
                return (key, acc)

            return jax.lax.fori_loop(0, iters, body, (key, 0.0))[1]
        return pipeline_chain

    def measure(pipeline_chain):
        # warmup / compile (also materialize to force execution)
        float(np.asarray(pipeline_chain(jax.random.PRNGKey(0), 2)))
        best = 0.0
        for rep in range(3):
            t0 = time.perf_counter()
            acc = pipeline_chain(jax.random.PRNGKey(rep + 1), INNER_ITERS)
            float(np.asarray(acc))  # forces real completion
            dt = time.perf_counter() - t0
            best = max(best, INNER_ITERS * n / dt)
        return best

    import jax as _jax
    on_tpu0 = _jax.devices()[0].platform == "tpu"
    best_xla = measure(make_pipeline_chain(False))
    # the fused per-grasp-chain Pallas mega-kernel (ops/grasp_chain.py) is
    # the serving path on TPU; report both and headline the better one
    best_chain = measure(make_pipeline_chain(True)) if on_tpu0 else 0.0
    best_bf16 = measure(make_pipeline_chain(False, bf16=True)) \
        if on_tpu0 else 0.0
    best = max(best_xla, best_chain, best_bf16)

    # ---------------------------------------------- cold-object serving
    from dexgangrasp_tpu.engine.pipeline import object_to_grasps
    from dexgangrasp_tpu.ops.bps import (
        bps_encode_pallas,
        bps_encode_xla,
        load_basis,
        pad_cloud,
    )

    basis = jnp.asarray(load_basis())
    clouds = []
    for i in range(COLD_OBJECTS):
        d = rng.normal(size=(2048, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        r = rng.uniform(0.03, 0.09)
        clouds.append(pad_cloud((r * d).astype(np.float32), CLOUD_PAD))
    clouds = jnp.asarray(np.stack(clouds))  # (K, 8192, 3)

    def cold_chain_fn(use_pallas):
        @functools.partial(jax.jit, static_argnames=())
        def chain(key):
            def body(i, carry):
                key, acc = carry
                key, k = jax.random.split(key)
                g = object_to_grasps(gen_folded, eva_folded, basis,
                                     clouds[i], k, n_samples=1000,
                                     top_k=10, use_pallas=use_pallas)
                return (key, acc + g.score[0] + g.transl[0].sum())
            return jax.lax.fori_loop(0, COLD_OBJECTS, body, (key, 0.0))[1]
        return chain

    def encode_chain_fn(encode):
        @jax.jit
        def chain(_):
            def body(i, acc):
                # offset each cloud by the (tiny) accumulator so iterations
                # are data-dependent and cannot overlap/fuse away
                enc = encode(basis, clouds[i] + acc * 1e-12)
                return acc + enc[0]
            return jax.lax.fori_loop(0, COLD_OBJECTS, body, 0.0)
        return chain

    def timed(fn, arg):
        float(np.asarray(fn(arg)))  # compile + warm
        t0 = time.perf_counter()
        float(np.asarray(fn(arg)))
        return (time.perf_counter() - t0) * 1000.0 / COLD_OBJECTS

    extras = {"grasps_per_sec_xla": round(best_xla, 1)}
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        extras["grasps_per_sec_chain_kernel"] = round(best_chain, 1)
        # on-hardware numerics of the mega-kernel vs the XLA layer graph
        from dexgangrasp_tpu.ops.grasp_chain import grasp_chain_pallas

        gctx = folding.generator_object_context(gen_folded, bps)
        ectx = folding.evaluator_object_context(eva_folded, bps)
        zc = jax.random.normal(jax.random.PRNGKey(5), (n, 5), jnp.float32)
        rot6, transl, joints = folding.generator_apply_folded(
            gen_folded, gctx, zc)
        rot = rot_matrix_from_ortho6d(rot6)
        transl = translate_along_axis(transl, rot, 0, 0.025)
        pose = jnp.concatenate([rot.reshape(n, 9), transl], axis=1)
        score = folding.evaluator_apply_folded(eva_folded, ectx, pose)
        _, tc, _, sc = grasp_chain_pallas(gen_folded, eva_folded, gctx,
                                          ectx, zc, z_offset=0.025,
                                          tile=1024)
        extras["chain_kernel_max_abs_diff"] = float(
            max(np.max(np.abs(np.asarray(sc) - np.asarray(score))),
                np.max(np.abs(np.asarray(tc) - np.asarray(transl)))))

        # bf16 serving-mode numerics gate: same z through both paths; the
        # serving contract is the returned top-k SET (scores feed a
        # threshold filter, not downstream math), so gate on top-1024
        # set overlap + score error, and only let bf16 claim the headline
        # when it holds.
        gctx_b = folding.generator_object_context(
            gen_bf16, bps.astype(jnp.bfloat16))
        ectx_b = folding.evaluator_object_context(
            eva_bf16, bps.astype(jnp.bfloat16))
        rot6_b, transl_b, _ = folding.generator_apply_folded(
            gen_bf16, gctx_b, zc.astype(jnp.bfloat16))
        rot_b = rot_matrix_from_ortho6d(rot6_b.astype(jnp.float32))
        transl_b = translate_along_axis(transl_b.astype(jnp.float32),
                                        rot_b, 0, 0.025)
        pose_b = jnp.concatenate([rot_b.reshape(n, 9), transl_b],
                                 axis=1).astype(jnp.bfloat16)
        score_b = np.asarray(folding.evaluator_apply_folded(
            eva_bf16, ectx_b, pose_b).astype(jnp.float32))
        score_f = np.asarray(score)
        top_f = set(np.argsort(score_f)[-TOP_K:].tolist())
        top_b = set(np.argsort(score_b)[-TOP_K:].tolist())
        overlap = len(top_f & top_b) / float(TOP_K)
        extras["bf16_topk_overlap"] = round(overlap, 4)
        extras["bf16_score_mae"] = float(np.mean(np.abs(score_b - score_f)))
        extras["bf16_transl_max_abs_mm"] = float(
            np.max(np.abs(np.asarray(transl_b) - np.asarray(transl)))
            * 1000.0)
        extras["grasps_per_sec_bf16"] = round(best_bf16, 1)
        # gate on absolute score error (the 3-stage filter consumes
        # absolute probabilities; 5e-3 is 1/10th of a filter band) —
        # top-k overlap is diagnostic only (near-tie ordering is
        # unstable under ANY precision change and harmless)
        if extras["bf16_score_mae"] > 5e-3:
            best = max(best_xla, best_chain)
    extras["cold_object_ms"] = round(
        timed(cold_chain_fn(False), jax.random.PRNGKey(11)), 3)
    extras["bps_encode_ms"] = round(timed(encode_chain_fn(bps_encode_xla),
                                          None), 3)
    if on_tpu:
        extras["cold_object_ms_pallas"] = round(
            timed(cold_chain_fn(True), jax.random.PRNGKey(11)), 3)
        extras["bps_encode_ms_pallas"] = round(
            timed(encode_chain_fn(bps_encode_pallas), None), 3)
        # on-hardware numerics: Pallas kernel vs blocked XLA
        diff = 0.0
        for i in range(4):
            a = np.asarray(bps_encode_pallas(basis, clouds[i]))
            b = np.asarray(bps_encode_xla(basis, clouds[i]))
            diff = max(diff, float(np.max(np.abs(a - b))))
        extras["pallas_max_abs_diff"] = diff

    # diffusion family serving latency (the diversity default): full
    # DDIM-50 sample of 1000 grasps, whole-sampler Pallas kernel on TPU
    try:
        from dexgangrasp_tpu.models.diffusion import DexDiffuser
        from dexgangrasp_tpu.ops.ddim_chain import ddim_sample_pallas

        dmodel = DexDiffuser()
        dparams = dmodel.init(jax.random.PRNGKey(7))

        @jax.jit
        def ddim_chain_bench(key):
            def body(i, carry):
                key, acc = carry
                key, k = jax.random.split(key)
                g = ddim_sample_pallas(dmodel, dparams, bps, k, 1000,
                                       steps=50)
                return (key, acc + g[0].sum())
            return jax.lax.fori_loop(0, 10, body, (key, 0.0))[1]

        float(np.asarray(ddim_chain_bench(jax.random.PRNGKey(0))))
        t0 = time.perf_counter()
        float(np.asarray(ddim_chain_bench(jax.random.PRNGKey(1))))
        extras["ddim50_n1000_ms"] = round(
            (time.perf_counter() - t0) * 100.0, 3)
    except Exception as e:  # never let the extra metric kill the bench
        extras["ddim50_n1000_ms"] = f"error: {e}"

    # PRODUCTION recipe serving latency (VERDICT r2 next-2/weak-4): guided
    # DDIM-10 — the differentiable XLA scan with an evaluator VJP per step
    # (engine/diffusion_pipeline.py:sample_guided), n=1000, as served by
    # the closed-loop frame program.
    try:
        from dexgangrasp_tpu.engine.diffusion_pipeline import (
            sample_and_score_guided,
        )
        from dexgangrasp_tpu.models.diffusion import DexDiffuser

        gmodel = DexDiffuser()
        gparams = gmodel.init(jax.random.PRNGKey(7))

        @jax.jit
        def guided_chain(key):
            def body(i, carry):
                key, acc = carry
                key, k = jax.random.split(key)
                g = sample_and_score_guided(gmodel, gparams, eva_folded,
                                            None, bps, k, 1000, steps=10,
                                            guidance_scale=10.0)
                return (key, acc + g.score[0] + g.transl[0].sum())
            return jax.lax.fori_loop(0, 10, body, (key, 0.0))[1]

        float(np.asarray(guided_chain(jax.random.PRNGKey(0))))
        t0 = time.perf_counter()
        float(np.asarray(guided_chain(jax.random.PRNGKey(1))))
        extras["guided_ddim10_n1000_ms"] = round(
            (time.perf_counter() - t0) * 100.0, 3)
    except Exception as e:
        extras["guided_ddim10_n1000_ms"] = f"error: {e}"

    # COMPOSED FRONTIER serving latency (VERDICT r3 next-1): guided
    # DDIM-10 + fused 10-step evaluator-gradient refinement + SO(3)
    # projection + rescore + top-k — the quality-saturating recipe the
    # closed loop serves (runs/best_pipeline_refined.json: 1.000 true
    # success @ 99.56% yield), n=1000, one program.
    try:
        from dexgangrasp_tpu.engine.diffusion_pipeline import (
            sample_refine_rescore_diffusion,
        )
        from dexgangrasp_tpu.models.diffusion import DexDiffuser

        fmodel = DexDiffuser()
        fparams = fmodel.init(jax.random.PRNGKey(7))

        @jax.jit
        def frontier_chain(key):
            def body(i, carry):
                key, acc = carry
                key, k = jax.random.split(key)
                g, _ = sample_refine_rescore_diffusion(
                    fmodel, fparams, eva_folded, None, bps, k, 1000,
                    top_k=10, steps=10, refine_steps=10,
                    guidance_scale=10.0)
                return (key, acc + g.score[0] + g.transl[0].sum())
            return jax.lax.fori_loop(0, 10, body, (key, 0.0))[1]

        float(np.asarray(frontier_chain(jax.random.PRNGKey(0))))
        t0 = time.perf_counter()
        float(np.asarray(frontier_chain(jax.random.PRNGKey(1))))
        extras["frontier_n1000_ms"] = round(
            (time.perf_counter() - t0) * 100.0, 3)
    except Exception as e:
        extras["frontier_n1000_ms"] = f"error: {e}"

    # DISTILLED STUDENT serving latency (round 4): the one-step student
    # (train/distill.py) replaces the 10-step guided scan with a single
    # denoiser eval; also timed with the fused refine tail (the distilled
    # frontier).  Weight-independent timing (fresh init), n=1000.
    try:
        from dexgangrasp_tpu.engine.diffusion_pipeline import (
            sample_and_score_student,
            sample_refine_rescore_diffusion as _srrd,
        )
        from dexgangrasp_tpu.models.diffusion import DexDiffuser

        smodel = DexDiffuser()
        sparams = smodel.init(jax.random.PRNGKey(7))

        def student_bench(refine_steps):
            @jax.jit
            def chain(key):
                def body(i, carry):
                    key, acc = carry
                    key, k = jax.random.split(key)
                    if refine_steps:
                        g, _ = _srrd(smodel, sparams, eva_folded, None,
                                     bps, k, 1000, top_k=10,
                                     refine_steps=refine_steps,
                                     student=True)
                    else:
                        g = sample_and_score_student(smodel, sparams,
                                                     eva_folded, None,
                                                     bps, k, 1000)
                    return (key, acc + g.score[0] + g.transl[0].sum())
                return jax.lax.fori_loop(0, 10, body, (key, 0.0))[1]

            float(np.asarray(chain(jax.random.PRNGKey(0))))
            t0 = time.perf_counter()
            float(np.asarray(chain(jax.random.PRNGKey(1))))
            return round((time.perf_counter() - t0) * 100.0, 3)

        extras["student_n1000_ms"] = student_bench(0)
        extras["student_frontier_n1000_ms"] = student_bench(10)
    except Exception as e:
        extras["student_n1000_ms"] = f"error: {e}"

    # SET-PREDICTION serving latency (round 4): the DGTR-style family
    # (models/grasp_transformer.py) emits its whole n_queries=16 grasp set
    # in ONE deterministic forward — no sampling axis, so the comparable
    # metric is per-set, not per-1000.  Weight-independent (fresh init).
    try:
        from dexgangrasp_tpu.engine.set_pipeline import (
            predict_refine_topk_set,
        )
        from dexgangrasp_tpu.models.grasp_transformer import GraspTransformer

        tmodel = GraspTransformer()
        tparams = tmodel.init(jax.random.PRNGKey(8))

        def set_bench(refine_steps):
            @jax.jit
            def chain(key):
                def body(i, acc):
                    g = predict_refine_topk_set(
                        tmodel, tparams, eva_folded, None,
                        bps + acc * 1e-12, top_k=10,
                        refine_steps=refine_steps)
                    return acc + g.score[0] + g.transl[0].sum()
                return jax.lax.fori_loop(0, 10, body, jnp.float32(0.0))

            float(np.asarray(chain(jax.random.PRNGKey(0))))
            t0 = time.perf_counter()
            float(np.asarray(chain(jax.random.PRNGKey(1))))
            return round((time.perf_counter() - t0) * 100.0, 3)

        # independent try per variant: a frontier-only failure must not
        # overwrite a good set_n16_ms measurement (advisor r4)
        try:
            extras["set_n16_ms"] = set_bench(0)
        except Exception as e:
            extras["set_n16_ms"] = f"error: {e}"
        try:
            extras["set_frontier_n16_ms"] = set_bench(10)
        except Exception as e:
            extras["set_frontier_n16_ms"] = f"error: {e}"
    except Exception as e:
        extras["set_n16_ms"] = f"error: {e}"

    # WHOLE-SCENE serving (VERDICT r4 #8): K=4 objects, one device program
    # (frame_to_grasps_multi: RANSAC plane + cluster + 4× encode/sample/
    # score/top-10).  Synthetic decimated tabletop scene at the closed-loop
    # bench's scale (~6k valid of 8192 padded); statistical outlier mode —
    # the robust setting for synthetic point densities (the radius filter's
    # defaults assume real camera frames, see tests/test_frame_pipeline).
    try:
        from dexgangrasp_tpu.engine.frame_pipeline import (
            frame_to_grasps_multi,
        )

        srng = np.random.default_rng(3)
        table = np.stack([srng.uniform(-0.20, 0.20, 3200),
                          srng.uniform(-0.17, 0.17, 3200),
                          np.full(3200, 0.90)], axis=1)
        blobs = []
        for cx, cy in ((-0.10, -0.08), (0.10, -0.08),
                       (-0.10, 0.08), (0.10, 0.08)):
            b = srng.normal(size=(700, 3)) * [0.02, 0.02, 0.03]
            b[:, 2] = np.clip(b[:, 2], -0.04, 0.04)
            blobs.append(b + [cx, cy, 0.84])
        scene = np.concatenate([table] + blobs).astype(np.float32)
        scene += srng.normal(size=scene.shape).astype(np.float32) * 5e-4
        scene_pts = jnp.asarray(pad_cloud(scene, CLOUD_PAD))
        scene_nv = jnp.int32(scene.shape[0])

        def scene_call(key, pts):
            return frame_to_grasps_multi(
                gen_folded, eva_folded, basis, pts, scene_nv, key,
                n_samples=1000, top_k=10, max_objects=4,
                outlier_method="statistical")

        g0, _, n_objs0, _ = scene_call(jax.random.PRNGKey(21), scene_pts)
        found = int((np.asarray(n_objs0) > 0).sum())
        extras["scene_k4_objects"] = found

        @jax.jit
        def scene_chain(key):
            def body(i, carry):
                key, acc = carry
                key, k = jax.random.split(key)
                g, _, n_objs, _ = scene_call(k, scene_pts + acc * 1e-12)
                return (key, acc + g.score[0, 0] + g.transl[0, 0].sum()
                        + n_objs.sum().astype(jnp.float32))
            return jax.lax.fori_loop(0, 10, body, (key, 0.0))[1]

        float(np.asarray(scene_chain(jax.random.PRNGKey(0))))
        t0 = time.perf_counter()
        float(np.asarray(scene_chain(jax.random.PRNGKey(1))))
        scene_ms = (time.perf_counter() - t0) * 100.0
        extras["scene_k4_ms"] = round(scene_ms, 3)
        extras["scene_objects_per_sec"] = round(found * 1000.0 / scene_ms,
                                                2)
    except Exception as e:
        extras["scene_k4_ms"] = f"error: {e}"

    print(json.dumps({
        "metric": "grasps_per_sec",
        "value": round(best, 1),
        "unit": "grasps/s",
        "vs_baseline": round(best / BASELINE, 3),
        **extras,
    }))


if __name__ == "__main__":
    sys.exit(main())
