"""Mesh/image IO helpers (replaces trimesh/open3d/imageio usage for export).

reference counterparts: mesh export via trimesh/open3d
(gaussian_model_dpsr_dynamic_anchor.py export_mesh :830-856, train.py:389-423
dynamic-mesh dump), image dumps via imageio (train.py:323-386).
"""

from __future__ import annotations

import os

import numpy as np


def write_obj(path: str, verts: np.ndarray, faces: np.ndarray,
              vert_colors: np.ndarray = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        if vert_colors is not None:
            for v, c in zip(verts, vert_colors):
                f.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
        else:
            for v in verts:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for tri in faces:
            f.write(f"f {tri[0] + 1} {tri[1] + 1} {tri[2] + 1}\n")


def read_obj(path: str):
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            p = line.split()
            if not p:
                continue
            if p[0] == "v":
                verts.append([float(x) for x in p[1:4]])
            elif p[0] == "f":
                faces.append([int(x.split("/")[0]) - 1 for x in p[1:4]])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def write_mesh_ply(path: str, verts: np.ndarray, faces: np.ndarray,
                   vert_colors: np.ndarray = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n, m = len(verts), len(faces)
    with open(path, "wb") as f:
        hdr = ["ply", "format binary_little_endian 1.0", f"element vertex {n}",
               "property float x", "property float y", "property float z"]
        if vert_colors is not None:
            hdr += ["property uchar red", "property uchar green", "property uchar blue"]
        hdr += [f"element face {m}", "property list uchar int vertex_indices",
                "end_header"]
        f.write(("\n".join(hdr) + "\n").encode())
        if vert_colors is not None:
            vc = (np.clip(vert_colors, 0, 1) * 255).astype(np.uint8)
            rec = np.zeros(n, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
            rec["xyz"] = verts.astype("<f4")
            rec["rgb"] = vc
            f.write(rec.tobytes())
        else:
            f.write(verts.astype("<f4").tobytes())
        frec = np.zeros(m, dtype=[("n", "u1"), ("idx", "<i4", 3)])
        frec["n"] = 3
        frec["idx"] = faces.astype("<i4")
        f.write(frec.tobytes())


def read_mesh_ply(path: str):
    with open(path, "rb") as f:
        n = m = 0
        vert_props = []
        in_vertex = False
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
                in_vertex = True
            elif line.startswith("element face"):
                m = int(line.split()[-1])
                in_vertex = False
            elif line.startswith("property") and in_vertex:
                vert_props.append(line.split()[1])
            elif line == "end_header":
                break
        sizes = {"float": 4, "uchar": 1, "int": 4, "double": 8}
        vsize = sum(sizes[t] for t in vert_props)
        raw = f.read(n * vsize)
        fields = []
        for j, t in enumerate(vert_props):
            fields.append((f"p{j}", {"float": "<f4", "uchar": "u1", "int": "<i4",
                                     "double": "<f8"}[t]))
        rec = np.frombuffer(raw, dtype=np.dtype(fields), count=n)
        verts = np.stack([rec["p0"], rec["p1"], rec["p2"]], -1).astype(np.float32)
        fraw = f.read()
        frec = np.frombuffer(fraw, dtype=np.dtype([("n", "u1"), ("idx", "<i4", 3)]),
                             count=m)
        faces = frec["idx"].astype(np.int32)
    return verts, faces


def save_image(path: str, img: np.ndarray):
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)
