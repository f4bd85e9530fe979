"""Tabulate a ``bench_closed_loop.py`` capture jsonl into the markdown
tables docs/RESULTS.md carries.

The round-4 capture protocol appends one row per (family, depth) —
or per (family, K) for whole-scene ``--multi`` runs — across multiple
independent passes (relay timing variance is ~±7% between processes, so
single-run A/Bs are not evidence; see CLAUDE.md).  This tool groups the
rows and reports median-across-passes with the min–max spread, plus the
capture→publish latency axes the depth-1-vs-2 trade is judged on
(VERDICT r3 next-3).

Usage:  python -m dexgangrasp_tpu.tools.closed_loop_report \
            runs/closed_loop_r4.jsonl
"""
from __future__ import annotations

import json
import statistics
import sys
from collections import defaultdict
from typing import Dict, List, Tuple


def load_rows(path: str) -> List[dict]:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def _med(vals: List[float]) -> float:
    return statistics.median(vals)


def _spread(vals: List[float]) -> str:
    if len(vals) == 1:
        return f"{vals[0]:.1f}"
    return f"{_med(vals):.1f} ({min(vals):.1f}–{max(vals):.1f})"


def group_single(rows: List[dict]) -> Dict[Tuple[str, int], List[dict]]:
    g = defaultdict(list)
    for r in rows:
        if r.get("metric") == "closed_loop_fps":
            g[(r["family"], int(r["depth"]))].append(r)
    return g


def group_multi(rows: List[dict]) -> Dict[Tuple[str, int], List[dict]]:
    g = defaultdict(list)
    for r in rows:
        if r.get("metric") == "closed_loop_multi_fps":
            g[(r["family"], int(r["n_objects"]))].append(r)
    return g


FAMILY_ORDER = ["gan", "vae", "diffusion", "guided", "frontier",
                "distill", "distill_frontier", "vae_frontier",
                "set", "set_frontier"]


def _fam_key(fam: str) -> int:
    return FAMILY_ORDER.index(fam) if fam in FAMILY_ORDER else 99


def render_single(g: Dict[Tuple[str, int], List[dict]]) -> str:
    out = ["| family | depth | passes | fps med (min–max) | serial fps | "
           "lat p50 ms | lat p95 ms | host prep ms |",
           "|---|---|---|---|---|---|---|---|"]
    for (fam, depth) in sorted(g, key=lambda k: (_fam_key(k[0]), k[1])):
        rs = g[(fam, depth)]

        # pre-round-4 rows lack serial_fps/latency/host_prep_ms — degrade
        # to "–" instead of crashing on old jsonl files (advisor r4)
        def col(key, fmt=_spread):
            vals = [r[key] for r in rs if key in r]
            return fmt(vals) if vals else "–"

        out.append(
            f"| {fam} | {depth} | {len(rs)} "
            f"| {_spread([r['value'] for r in rs])} "
            f"| {col('serial_fps')} "
            f"| {col('latency_p50_ms')} "
            f"| {col('latency_p95_ms')} "
            f"| {col('host_prep_ms', lambda v: f'{_med(v):.1f}')} |")
    return "\n".join(out)


def render_multi(g: Dict[Tuple[str, int], List[dict]]) -> str:
    if not g:
        return "(no --multi rows captured)"
    out = ["| family | K objects | passes | scene fps med (min–max) | "
           "objects found | objects/s |",
           "|---|---|---|---|---|---|"]
    for (fam, k) in sorted(g, key=lambda kk: (_fam_key(kk[0]), kk[1])):
        rs = g[(fam, k)]
        # aggregate across passes (min–max), not just the first row
        found = [r.get("objects_found") for r in rs
                 if r.get("objects_found") is not None]
        fmin, fmax = (min(found), max(found)) if found else ("?", "?")
        found_s = (f"{fmin}/{k}" if fmin == fmax else f"{fmin}–{fmax}/{k}")
        out.append(
            f"| {fam} | {k} | {len(rs)} "
            f"| {_spread([r['value'] for r in rs])} "
            f"| {found_s} "
            f"| {_spread([r['object_rate_per_s'] for r in rs])} |")
    return "\n".join(out)


def depth_tradeoff(g: Dict[Tuple[str, int], List[dict]]) -> str:
    """One-line-per-family freshness-vs-rate summary: what depth-2 buys
    (fps ratio) and costs (added p50 latency) over depth-1."""
    out = ["| family | fps ×(d2/d1) | Δ lat p50 ms | Δ lat p95 ms |",
           "|---|---|---|---|"]
    fams = sorted({f for (f, _) in g}, key=_fam_key)
    for fam in fams:
        d1, d2 = g.get((fam, 1)), g.get((fam, 2))
        if not d1 or not d2:
            continue
        r = _med([x["value"] for x in d2]) / _med([x["value"] for x in d1])

        def dlat(key):
            a = [x[key] for x in d2 if key in x]
            b = [x[key] for x in d1 if key in x]
            return f"{_med(a) - _med(b):+.1f}" if a and b else "–"

        out.append(f"| {fam} | {r:.2f}× | {dlat('latency_p50_ms')} "
                   f"| {dlat('latency_p95_ms')} |")
    return "\n".join(out)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    path = argv[0] if argv else "runs/closed_loop_r4.jsonl"
    rows = load_rows(path)
    gs, gm = group_single(rows), group_multi(rows)
    print(f"## Closed loop ({path}: {len(rows)} rows)\n")
    print(render_single(gs))
    print("\n### depth-2 trade (rate bought vs freshness spent)\n")
    print(depth_tradeoff(gs))
    print("\n### whole-scene (--multi K)\n")
    print(render_multi(gm))


if __name__ == "__main__":
    main()
