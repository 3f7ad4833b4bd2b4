"""Binary PLY point-cloud export (libvis point_cloud.h:487-529 analog)."""

from __future__ import annotations

import struct

import numpy as np


def save_ply(
    path: str,
    positions: np.ndarray,          # [N, 3] f32
    normals: np.ndarray = None,     # [N, 3] f32
    colors: np.ndarray = None,      # [N, 3] in [0, 255]
) -> None:
    n = len(positions)
    props = ["property float x", "property float y", "property float z"]
    if normals is not None:
        props += ["property float nx", "property float ny", "property float nz"]
    if colors is not None:
        props += [
            "property uchar red", "property uchar green", "property uchar blue"
        ]
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n" + "\n".join(props) + "\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        pos = np.asarray(positions, "<f4")
        nrm = np.asarray(normals, "<f4") if normals is not None else None
        col = (
            np.clip(np.asarray(colors), 0, 255).astype(np.uint8)
            if colors is not None else None
        )
        for i in range(n):
            f.write(pos[i].tobytes())
            if nrm is not None:
                f.write(nrm[i].tobytes())
            if col is not None:
                f.write(col[i].tobytes())


def load_ply(path: str):
    """Minimal binary/ascii PLY reader for round-trip tests."""
    with open(path, "rb") as f:
        line = f.readline().strip()
        assert line == b"ply"
        fmt = None
        n = 0
        props = []
        while True:
            line = f.readline().strip().decode("ascii")
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element vertex"):
                n = int(line.split()[2])
            elif line.startswith("property"):
                props.append(tuple(line.split()[1:3]))
            elif line == "end_header":
                break
        dtmap = {"float": "<f4", "uchar": "u1", "double": "<f8"}
        dtype = np.dtype([(name, dtmap[t]) for t, name in props])
        if fmt == "binary_little_endian":
            data = np.frombuffer(f.read(dtype.itemsize * n), dtype=dtype)
        else:
            rows = [f.readline().split() for _ in range(n)]
            data = np.array(
                [tuple(float(v) for v in r) for r in rows], dtype=dtype
            )
    return data
