"""Wavefront OBJ loading (parity: core/utils/WavefrontMeshLoader.hpp)."""

from __future__ import annotations

import numpy as np


def load_obj(path):
    """Parse a Wavefront OBJ into (vertices (V,3), faces (T,3) int32).

    Polygon faces are fan-triangulated; v/vt/vn index forms and negative
    (relative) indices are supported.
    """
    from ..core import load_obj as _native_obj

    native = _native_obj(path)
    if native is not None:
        return native
    verts = []
    faces = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if parts[0] == "v" and len(parts) >= 4:
                verts.append([float(parts[1]), float(parts[2]),
                              float(parts[3])])
            elif parts[0] == "f" and len(parts) >= 4:
                idx = []
                for tok in parts[1:]:
                    vi = tok.split("/")[0]
                    i = int(vi)
                    idx.append(i - 1 if i > 0 else len(verts) + i)
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return (
        np.asarray(verts, np.float64).reshape(-1, 3),
        np.asarray(faces, np.int32).reshape(-1, 3),
    )
