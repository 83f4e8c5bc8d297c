"""Output writers and checkpoint readers.

Parity targets: dT's CSV/VTK writers (dT.cpp:1174-1936) and the static
checkpoint readers (API.h:1124-1249). Column names follow the reference's
output-file constants (Structs.h:41-96) so checkpoints interoperate
conceptually: x,y,z, Q_w..Q_z, v_*, w_*, r, family, clump_type...
"""

from __future__ import annotations

import csv
from typing import Dict, Optional

import numpy as np


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------


def write_csv(path, columns: Dict[str, np.ndarray]):
    keys = list(columns)
    # fast native path when every column is numeric
    if keys:
        try:
            cols64 = [
                np.asarray(columns[k], np.float64).reshape(
                    len(np.asarray(columns[keys[0]]).reshape(-1)), -1
                )
                for k in keys
            ]
            from ..core import write_csv_numeric

            widths = [c.shape[1] for c in cols64]
            header = ",".join(
                k if w == 1 else ",".join(f"{k}_{i}" for i in range(w))
                for k, w in zip(keys, widths)
            )
            data = np.concatenate(cols64, axis=1)
            if write_csv_numeric(path, header, data):
                return
        except (ValueError, TypeError):
            pass  # non-numeric columns: python writer below
    n = len(np.asarray(columns[keys[0]]).reshape(-1)) if keys else 0
    cols = {
        k: np.asarray(v).reshape(n, -1) if n else np.zeros((0, 1))
        for k, v in columns.items()
    }
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        header = []
        for k in keys:
            width = cols[k].shape[1]
            header += [k] if width == 1 else [f"{k}_{i}" for i in range(width)]
        w.writerow(header)
        for i in range(n):
            row = []
            for k in keys:
                for x in cols[k][i]:
                    v = x.item() if hasattr(x, "item") else x
                    row.append(repr(v) if isinstance(v, float) else str(v))
            w.writerow(row)


def write_table(path, columns: Dict[str, np.ndarray], fmt="csv"):
    """Format dispatch for the Write*File family (reference OUTPUT_FORMAT,
    API.h:1317-1354): "csv" or "binary"/"chpf" (compressed npz with the
    same column names; load with np.load).

    On the ChPF stand-in: the reference's binary output is the external
    ChPF library, an OFF-by-default cmake option fetched from gitlab at
    build time (reference CMakeLists.txt:60-80) — its wire format is not
    part of the reference tree, so there is no spec to be compatible
    with here. npz is the documented binary format of this package:
    self-describing, compressed, and loadable from any numpy."""
    fmt = getattr(fmt, "value", fmt)
    if str(fmt).lower() in ("binary", "chpf", "npz"):
        # write through a handle: np.savez_compressed APPENDS '.npz' to a
        # bare path, which would create a different filename than asked
        with open(path, "wb") as f:
            np.savez_compressed(
                f, **{k: np.asarray(v) for k, v in columns.items()}
            )
        return
    write_csv(path, columns)


def write_spheres_csv(path, pos, radius, owner=None, absv=None, family=None,
                      extra: Optional[Dict[str, np.ndarray]] = None,
                      fmt="csv"):
    cols = {"x": pos[:, 0], "y": pos[:, 1], "z": pos[:, 2], "r": radius}
    if owner is not None:
        cols["owner"] = owner
    if absv is not None:
        cols["absv"] = absv
    if family is not None:
        cols["family"] = family
    cols.update(extra or {})
    write_table(path, cols, fmt)


def write_clumps_csv(path, pos, quat, vel=None, ang_vel=None, family=None,
                     clump_type=None,
                     extra: Optional[Dict[str, np.ndarray]] = None,
                     fmt="csv"):
    cols = {"x": pos[:, 0], "y": pos[:, 1], "z": pos[:, 2]}
    if clump_type is not None:
        cols["clump_type"] = clump_type
    cols.update(
        {"Qw": quat[:, 0], "Qx": quat[:, 1], "Qy": quat[:, 2],
         "Qz": quat[:, 3]}
    )
    if vel is not None:
        cols.update({"v_x": vel[:, 0], "v_y": vel[:, 1], "v_z": vel[:, 2]})
    if ang_vel is not None:
        cols.update(
            {"w_x": ang_vel[:, 0], "w_y": ang_vel[:, 1], "w_z": ang_vel[:, 2]}
        )
    if family is not None:
        cols["family"] = family
    cols.update(extra or {})
    write_table(path, cols, fmt)


def write_contacts_csv(path, idA, idB, ctype, point=None, force=None,
                       torque=None, normal=None,
                       wildcards: Optional[Dict[str, np.ndarray]] = None,
                       fmt="csv"):
    cols = {"A": idA, "B": idB, "contact_type": ctype}
    if point is not None:
        cols.update({"x": point[:, 0], "y": point[:, 1], "z": point[:, 2]})
    if force is not None:
        cols.update({"f_x": force[:, 0], "f_y": force[:, 1],
                     "f_z": force[:, 2]})
    if torque is not None:
        cols.update({"tof_x": torque[:, 0], "tof_y": torque[:, 1],
                     "tof_z": torque[:, 2]})
    if normal is not None:
        cols.update({"n_x": normal[:, 0], "n_y": normal[:, 1],
                     "n_z": normal[:, 2]})
    for k, v in (wildcards or {}).items():
        cols[k] = v
    write_table(path, cols, fmt)


def write_mesh_vtk(path, vertices, faces, normals=None, uv=None):
    """Legacy-VTK polydata mesh writer (reference writeMeshesAsVtk,
    dT.cpp:1850-1936) with per-facet normals as CELL_DATA and optional
    per-point texture coordinates."""
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    with open(path, "w") as out:
        out.write("# vtk DataFile Version 3.0\n")
        out.write("dem_engine_tpu mesh\nASCII\nDATASET POLYDATA\n")
        out.write(f"POINTS {len(v)} double\n")
        for p in v:
            out.write(f"{p[0]} {p[1]} {p[2]}\n")
        out.write(f"POLYGONS {len(f)} {4 * len(f)}\n")
        for tri in f:
            out.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")
        if uv is not None:
            t = np.asarray(uv, np.float64)
            out.write(f"POINT_DATA {len(v)}\n")
            out.write("TEXTURE_COORDINATES uv 2 double\n")
            for p in t:
                out.write(f"{p[0]} {p[1]}\n")
        if normals is not None:
            nrm = np.asarray(normals, np.float64)
            out.write(f"CELL_DATA {len(f)}\n")
            out.write("NORMALS facet_normals double\n")
            for p in nrm:
                out.write(f"{p[0]} {p[1]} {p[2]}\n")


def write_mesh_obj(path, vertices, faces, normals=None):
    """Wavefront OBJ mesh output (SetMeshOutputFormat('obj'))."""
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    with open(path, "w") as out:
        for p in v:
            out.write(f"v {p[0]} {p[1]} {p[2]}\n")
        if normals is not None:
            for p in np.asarray(normals, np.float64):
                out.write(f"vn {p[0]} {p[1]} {p[2]}\n")
            for i, tri in enumerate(f):
                out.write(
                    f"f {tri[0]+1}//{i+1} {tri[1]+1}//{i+1} "
                    f"{tri[2]+1}//{i+1}\n")
        else:
            for tri in f:
                out.write(f"f {tri[0]+1} {tri[1]+1} {tri[2]+1}\n")


# ---------------------------------------------------------------------------
# checkpoint readers (parity: API.h ReadClump*FromCsv, :1124-1249)
# ---------------------------------------------------------------------------


def _read_csv(path):
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    return rows


def read_clump_xyz_from_csv(path):
    """Returns {clump_type_name: (n,3) xyz}; unnamed types under ''."""
    out: Dict[str, list] = {}
    for row in _read_csv(path):
        name = row.get("clump_type", "")
        out.setdefault(name, []).append(
            [float(row["x"]), float(row["y"]), float(row["z"])]
        )
    return {k: np.asarray(v) for k, v in out.items()}


def read_clump_quat_from_csv(path):
    out: Dict[str, list] = {}
    for row in _read_csv(path):
        name = row.get("clump_type", "")
        out.setdefault(name, []).append(
            [float(row["Qw"]), float(row["Qx"]), float(row["Qy"]),
             float(row["Qz"])]
        )
    return {k: np.asarray(v) for k, v in out.items()}


def read_clump_vel_from_csv(path):
    out: Dict[str, list] = {}
    for row in _read_csv(path):
        name = row.get("clump_type", "")
        out.setdefault(name, []).append(
            [float(row["v_x"]), float(row["v_y"]), float(row["v_z"])]
        )
    return {k: np.asarray(v) for k, v in out.items()}


def read_clump_ang_vel_from_csv(path):
    out: Dict[str, list] = {}
    for row in _read_csv(path):
        name = row.get("clump_type", "")
        out.setdefault(name, []).append(
            [float(row["w_x"]), float(row["w_y"]), float(row["w_z"])]
        )
    return {k: np.asarray(v) for k, v in out.items()}


def read_clump_template_csv(path):
    """Clump-template component file: x,y,z,r columns, '#' comment lines
    (the reference's data/clumps format, read by LoadClumpType's filename
    overload, API.h:322). Returns (radii (n,), relpos (n,3))."""
    radii, rel = [], []
    with open(path, newline="") as f:
        rows = csv.DictReader(
            line for line in f if not line.lstrip().startswith("#")
        )
        for row in rows:
            rel.append([float(row["x"]), float(row["y"]), float(row["z"])])
            radii.append(float(row["r"]))
    return np.asarray(radii), np.asarray(rel)


def read_clump_float3_from_csv(path, xcol, ycol, zcol):
    """Generic float3-column reader keyed by clump type (reference
    API.h:1131 ReadClumpFloat3FromCsv): {type_name: (n,3) array}."""
    out: Dict[str, list] = {}
    for row in _read_csv(path):
        name = row.get("clump_type", "")
        out.setdefault(name, []).append(
            [float(row[xcol]), float(row[ycol]), float(row[zcol])]
        )
    return {k: np.asarray(v) for k, v in out.items()}


def read_contact_pairs_from_csv(path):
    rows = _read_csv(path)
    idA = np.asarray([int(r["A"]) for r in rows], np.int32)
    idB = np.asarray([int(r["B"]) for r in rows], np.int32)
    ctype = np.asarray(
        [int(r.get("contact_type", 1)) for r in rows], np.int32
    )
    return idA, idB, ctype


def read_contact_wildcards_from_csv(path, names):
    rows = _read_csv(path)
    return {
        n: np.asarray([float(r[n]) for r in rows], np.float32) for n in names
    }
