"""Wavefront OBJ loader.

Capability superset of the reference's two-pass loader (pre_parse_obj /
parse_obj, parser.cpp:687-982): v / vn / vt / f with face formats `v`,
`v//vn`, `v/vt/vn` (parser.h:40-48), n-gon fan triangulation, 1-based ->
0-based indices. The reference leaves vt parsing as a TODO
(parser.cpp:830-833); here texcoords are read. Negative (relative)
indices are resolved too.
"""

from __future__ import annotations

import numpy as np


def load_obj(path: str):
    """Returns dict with positions (V,3), normals (Vn,3) or None,
    texcoords (Vt,2) or None, and indices (F,3) int32 into positions
    (plus parallel normal_indices / texcoord_indices when present)."""
    from offline_raytracer_tpu.native import obj_parse_native
    with open(path, "rb") as fh:
        raw = fh.read()
    native = obj_parse_native(raw)
    if native is not None:
        return native

    positions, normals, texcoords = [], [], []
    f_pos, f_nrm, f_tex = [], [], []

    with open(path, "r", errors="replace") as fh:
        for line in fh:
            toks = line.split()
            if not toks or toks[0].startswith("#"):
                continue
            tag = toks[0]
            if tag == "v":
                positions.append([float(toks[1]), float(toks[2]), float(toks[3])])
            elif tag == "vn":
                normals.append([float(toks[1]), float(toks[2]), float(toks[3])])
            elif tag == "vt":
                texcoords.append([float(toks[1]), float(toks[2])])
            elif tag == "f":
                corners = [_parse_corner(t) for t in toks[1:]]
                # fan triangulation, same as PLY (parser.cpp:937-980)
                for j in range(1, len(corners) - 1):
                    tri = (corners[0], corners[j], corners[j + 1])
                    f_pos.append([c[0] for c in tri])
                    f_tex.append([c[1] for c in tri])
                    f_nrm.append([c[2] for c in tri])

    np_pos = np.asarray(positions, np.float32).reshape(-1, 3)

    def resolve(raw, count):
        idx = np.asarray(raw, np.int64)
        # OBJ is 1-based; negative = relative to end
        return np.where(idx > 0, idx - 1, idx + count).astype(np.int32)

    out = {
        "positions": np_pos,
        "indices": resolve([r for r in f_pos], len(positions))
        if f_pos else np.zeros((0, 3), np.int32),
        "normals": None,
        "normal_indices": None,
        "texcoords": None,
        "texcoord_indices": None,
    }
    if normals and any(c is not None for tri in f_nrm for c in tri):
        out["normals"] = np.asarray(normals, np.float32).reshape(-1, 3)
        out["normal_indices"] = resolve(
            [[0 if c is None else c for c in tri] for tri in f_nrm], len(normals))
    if texcoords and any(c is not None for tri in f_tex for c in tri):
        out["texcoords"] = np.asarray(texcoords, np.float32).reshape(-1, 2)
        out["texcoord_indices"] = resolve(
            [[0 if c is None else c for c in tri] for tri in f_tex], len(texcoords))
    return out


def _parse_corner(tok: str):
    """'7', '7//2', '7/5/2', '7/5' -> (pos, tex, nrm) raw 1-based or None."""
    parts = tok.split("/")
    pos = int(parts[0])
    tex = int(parts[1]) if len(parts) > 1 and parts[1] else None
    nrm = int(parts[2]) if len(parts) > 2 and parts[2] else None
    return pos, tex, nrm
