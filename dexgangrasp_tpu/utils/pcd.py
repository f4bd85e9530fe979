"""Minimal PCD (Point Cloud Data) file I/O.

Replaces the reference's open3d dependency for reading the canned scans in
``data/real_objects/object/*.pcd`` (ascii + binary v0.7, float32 fields).
Only xyz columns are returned; extra per-point fields (normals, rgb) are
parsed past transparently.
"""
from __future__ import annotations

import numpy as np

_DTYPES = {("F", 4): np.float32, ("F", 8): np.float64,
           ("I", 1): np.int8, ("I", 2): np.int16, ("I", 4): np.int32,
           ("U", 1): np.uint8, ("U", 2): np.uint16, ("U", 4): np.uint32}


def load_pcd(path: str) -> np.ndarray:
    """Read a .pcd file → (N, 3) float32 xyz array."""
    with open(path, "rb") as f:
        raw = f.read()

    # header is ascii lines up to the DATA line
    lines = []
    offset = 0
    while True:
        nl = raw.index(b"\n", offset)
        line = raw[offset:nl].decode("ascii", "replace").strip()
        offset = nl + 1
        if line and not line.startswith("#"):
            lines.append(line)
        if line.upper().startswith("DATA"):
            break

    hdr = {}
    for line in lines:
        parts = line.split()
        hdr[parts[0].upper()] = parts[1:]

    fields = hdr["FIELDS"]
    sizes = [int(s) for s in hdr["SIZE"]]
    types = hdr["TYPE"]
    counts = [int(c) for c in hdr.get("COUNT", ["1"] * len(fields))]
    n_points = int(hdr["POINTS"][0])
    mode = hdr["DATA"][0].lower()

    names, formats = [], []
    for f_name, size, typ, cnt in zip(fields, sizes, types, counts):
        for c in range(cnt):
            names.append(f_name if cnt == 1 else f"{f_name}_{c}")
            formats.append(_DTYPES[(typ.upper(), size)])

    if mode == "ascii":
        text = raw[offset:].decode("ascii", "replace")
        arr = np.loadtxt(text.splitlines(), dtype=np.float64,
                         max_rows=n_points)
        arr = np.atleast_2d(arr)
        cols = {n: arr[:, i] for i, n in enumerate(names)}
    elif mode == "binary":
        rec = np.dtype({"names": names, "formats": formats})
        arr = np.frombuffer(raw, dtype=rec, count=n_points, offset=offset)
        cols = {n: arr[n] for n in names}
    else:
        raise ValueError(f"Unsupported PCD DATA mode: {mode}")

    xyz = np.stack([cols["x"], cols["y"], cols["z"]], axis=1).astype(np.float32)
    # drop NaN points (organized clouds mark invalid pixels NaN)
    return xyz[np.isfinite(xyz).all(axis=1)]


def save_pcd(path: str, points: np.ndarray) -> None:
    """Write an (N, 3) xyz cloud as binary PCD v0.7."""
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n"
        "FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA binary\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(pts.tobytes())
