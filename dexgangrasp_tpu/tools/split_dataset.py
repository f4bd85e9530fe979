"""Dataset split tool — counterpart of ``scripts/train_test_eval_split.py``.

Copies per-object pointcloud/bps folders into train/test/eval trees based
on metadata.csv X-marks (reference :16-37); additionally can *write* the
X-marks from ratios (the reference assumes they pre-exist).
"""
from __future__ import annotations

import argparse
import os
import shutil
from typing import Dict, List


def assign_splits(objects: List[str], train: float = 0.7, test: float = 0.15,
                  eval_: float = 0.15, seed: int = 0) -> Dict[str, str]:
    import numpy as np

    assert abs(train + test + eval_ - 1.0) < 1e-6
    rng = np.random.default_rng(seed)
    objs = list(objects)
    rng.shuffle(objs)
    n = len(objs)
    n_train = int(round(n * train))
    n_test = int(round(n * test))
    out = {}
    for i, obj in enumerate(objs):
        out[obj] = ("train" if i < n_train
                    else "test" if i < n_train + n_test else "eval")
    return out


def split_from_metadata(data_dir: str, src_subdir: str = "all",
                        kinds=("pcd", "bps")) -> None:
    """Copy <data_dir>/<src_subdir>/{pcd,bps}/<obj> into split trees per
    metadata.csv marks (reference behavior)."""
    import pandas as pd

    df = pd.read_csv(os.path.join(data_dir, "metadata.csv"))
    name_col = df.columns[0]
    for split in ("train", "test", "eval"):
        if split not in df.columns:
            continue
        for obj in df[df[split] == "X"][name_col]:
            for kind in kinds:
                src = os.path.join(data_dir, src_subdir, kind, obj)
                dst = os.path.join(data_dir, split, kind, obj)
                if os.path.isdir(src) and not os.path.isdir(dst):
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.copytree(src, dst)


def mark_metadata(data_dir: str, train: float = 0.7, test: float = 0.15,
                  eval_: float = 0.15, seed: int = 0) -> None:
    """Write/overwrite split X-marks in metadata.csv."""
    import pandas as pd

    path = os.path.join(data_dir, "metadata.csv")
    df = pd.read_csv(path)
    name_col = df.columns[0]
    splits = assign_splits(list(df[name_col]), train, test, eval_, seed)
    for s in ("train", "test", "eval"):
        df[s] = [("X" if splits[o] == s else "") for o in df[name_col]]
    df.to_csv(path, index=False)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir")
    ap.add_argument("--mark", action="store_true",
                    help="assign split marks in metadata.csv first")
    ap.add_argument("--src", default="all")
    args = ap.parse_args()
    if args.mark:
        mark_metadata(args.data_dir)
    split_from_metadata(args.data_dir, args.src)
