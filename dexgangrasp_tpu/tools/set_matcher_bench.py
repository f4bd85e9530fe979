"""Set-trainer matcher A/B on chip: host Hungarian vs fused device auction.

The DETR step has two implementations (train/set_transformer.py):

- ``matcher="host"``: jit cost matrix → download (B, n_q, M) → scipy
  ``linear_sum_assignment`` per view → upload indices → jit grad step.
  TWO dispatched programs plus a hard host sync per step — through the
  axon relay each dispatch carries the ~35-50 ms fixed relay cost
  (CLAUDE.md), so the sync structure, not the matmuls, sets the pace.
- ``matcher="device"``: the eps-optimal auction (ops/assignment.py) runs
  inside the grad jit — ONE program per step, no host traffic; steps
  queue back-to-back on the device.

This tool times both at the real family shapes (default model, bs=32
views, M=32 GT pads) and reports steps/s + the speedup, ≥3 repeats each
(relay variance rule).  Timings thread the dependency through the train
state and materialize a final param leaf with np.asarray.

Usage (TPU):
    python -m dexgangrasp_tpu.tools.set_matcher_bench [--steps 30]
"""
from __future__ import annotations

import argparse
import json
import time


def run_matcher_bench(steps: int = 30, batch_views: int = 32,
                      max_grasps: int = 32, repeats: int = 3,
                      seed: int = 0, out_path=None) -> dict:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dexgangrasp_tpu.models.grasp_transformer import GraspTransformer
    from dexgangrasp_tpu.train.set_transformer import SetTrainer

    rng = np.random.default_rng(seed)
    model = GraspTransformer()
    trainer = SetTrainer(model)
    v = batch_views
    bps = rng.uniform(0, 0.2, (v, 4096)).astype(np.float32)
    gt = rng.normal(size=(v, max_grasps, model.g_dim)).astype(np.float32)
    mask = np.zeros((v, max_grasps), np.float32)
    for i in range(v):  # prefix-form validity (build_set_table contract)
        mask[i, : int(rng.integers(4, max_grasps + 1))] = 1.0

    report = {"steps": steps, "batch_views": v, "max_grasps": max_grasps,
              "n_queries": model.n_queries, "backend":
              jax.devices()[0].platform}

    def timed(matcher: str):
        ts = trainer.init_state(jax.random.PRNGKey(seed))
        # warm-up: compile + one full step of each program shape
        ts, _ = trainer.train_step(ts, bps, gt, mask, matcher=matcher)
        np.asarray(jax.tree.leaves(ts.params)[0])
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(steps):
                ts, logs = trainer.train_step(ts, bps, gt, mask,
                                              matcher=matcher)
            np.asarray(jax.tree.leaves(ts.params)[0])
            np.asarray(logs["loss"])
            times.append(time.perf_counter() - t0)
        return times, float(np.asarray(logs["loss"]))

    def timed_chunk():
        from dexgangrasp_tpu.train.fast import put_table, set_train_chunk

        dev = put_table({"bps": bps, "gt": gt, "mask": mask})
        ts = trainer.init_state(jax.random.PRNGKey(seed))
        key = jax.random.PRNGKey(seed + 1)
        ts, losses = set_train_chunk(trainer, ts, dev, key, steps=steps,
                                     batch_size=v)  # warm-up/compile
        np.asarray(jax.tree.leaves(ts.params)[0])
        times = []
        for _ in range(repeats):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            ts, losses = set_train_chunk(trainer, ts, dev, sub,
                                         steps=steps, batch_size=v)
            np.asarray(jax.tree.leaves(ts.params)[0])
            loss = float(np.asarray(losses[-1]))
            times.append(time.perf_counter() - t0)
        return times, loss

    for matcher in ("host", "device", "chunk"):
        times, loss = timed_chunk() if matcher == "chunk" else timed(matcher)
        best = min(times)
        report[matcher] = {
            "seconds_per_run": [round(t, 4) for t in times],
            "ms_per_step_best": round(1e3 * best / steps, 3),
            "steps_per_s_best": round(steps / best, 2),
            "final_loss": round(loss, 5),
        }
        print(f"{matcher:6s}: {report[matcher]['ms_per_step_best']:.1f} "
              f"ms/step best of {repeats} "
              f"({report[matcher]['steps_per_s_best']} steps/s), "
              f"loss {loss:.4f}", flush=True)

    report["device_speedup"] = round(
        report["host"]["ms_per_step_best"]
        / report["device"]["ms_per_step_best"], 3)
    report["chunk_speedup"] = round(
        report["host"]["ms_per_step_best"]
        / report["chunk"]["ms_per_step_best"], 3)
    print(f"device auction speedup: {report['device_speedup']}x; "
          f"scan-chunk speedup: {report['chunk_speedup']}x", flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", out_path, flush=True)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch-views", type=int, default=32)
    ap.add_argument("--max-grasps", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="runs/set_matcher_bench.json")
    args = ap.parse_args()
    run_matcher_bench(steps=args.steps, batch_views=args.batch_views,
                      max_grasps=args.max_grasps, repeats=args.repeats,
                      out_path=args.out)


if __name__ == "__main__":
    main()
