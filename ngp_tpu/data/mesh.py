"""Mesh loading (OBJ/STL) + native BVH bindings.

Replaces the reference's tinyobjloader wrapper + binary STL path
(ref: Testbed::load_mesh src/testbed_sdf.cu:989-1081) and TriangleBvh
(src/triangle_bvh.cu) with a numpy OBJ/STL parser and a multithreaded
C++ BVH (csrc/bvh.cpp) called through ctypes.

Normalization matches the reference: AABB inflated by 0.5% of its
diagonal, vertices mapped into the unit cube with uniform scale
1/max-extent, centered per-axis (ref: src/testbed_sdf.cu:1032-1043).
"""
from __future__ import annotations

import ctypes
import struct
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB = None


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        root = Path(__file__).resolve().parent.parent.parent / "csrc"
        so = root / "libngpbvh.so"
        if not so.exists():
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", "-o", str(so), str(root / "bvh.cpp"),
                 "-pthread"], check=True)
        lib = ctypes.CDLL(str(so))
        lib.bvh_build.restype = ctypes.c_void_p
        lib.bvh_build.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_void_p, ctypes.c_int64]
        lib.bvh_free.argtypes = [ctypes.c_void_p]
        lib.bvh_signed_distance.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int]
        lib.bvh_closest_points.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.bvh_raytrace.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        _LIB = lib
    return _LIB


def load_obj(path) -> tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ: v + f lines (polygons fan-triangulated)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [int(p.split("/")[0]) for p in line.split()[1:]]
                idx = [i - 1 if i > 0 else len(verts) + i for i in idx]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return (np.asarray(verts, np.float32), np.asarray(faces, np.int32))


def load_stl(path) -> tuple[np.ndarray, np.ndarray]:
    """Binary STL (ref: load_mesh STL branch)."""
    raw = Path(path).read_bytes()
    n = struct.unpack_from("<I", raw, 80)[0]
    tris = np.frombuffer(raw, np.uint8, n * 50, 84)
    tris = tris.reshape(n, 50)
    v = tris[:, 12:48].copy().view(np.float32).reshape(n, 3, 3)
    verts = v.reshape(-1, 3)
    faces = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
    return verts.astype(np.float32), faces


def load_mesh(path) -> tuple[np.ndarray, np.ndarray, float, np.ndarray]:
    """Load + normalize into the unit cube like the reference.

    Returns (vertices, faces, mesh_scale, offset): original coordinates are
    recovered as v_orig = v * mesh_scale + offset."""
    path = Path(path)
    if path.suffix.lower() == ".obj":
        verts, faces = load_obj(path)
    elif path.suffix.lower() == ".stl":
        verts, faces = load_stl(path)
    else:
        raise ValueError(f"unsupported mesh format {path.suffix}")
    if len(verts) == 0:
        raise ValueError("empty mesh")
    bmin, bmax = verts.min(0), verts.max(0)
    inflation = 0.005 * np.linalg.norm(bmax - bmin)
    bmin, bmax = bmin - inflation, bmax + inflation
    mesh_scale = float((bmax - bmin).max())
    center_off = (bmax + bmin) / 2 - mesh_scale / 2
    verts = (verts - center_off) / mesh_scale
    return verts.astype(np.float32), faces, mesh_scale, center_off


class TriangleBvh:
    """Host BVH over a triangle mesh (native C++ backend)."""

    MODE_WATERTIGHT = 0
    MODE_RAYSTAB = 1
    MODE_PATHESCAPE = 2  # random-walk escape (ref: optix/pathescape.cu)

    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        self.vertices = np.ascontiguousarray(vertices, np.float32)
        self.faces = np.ascontiguousarray(faces, np.int32)
        self._handle = _lib().bvh_build(
            self.vertices.ctypes.data, len(self.vertices),
            self.faces.ctypes.data, len(self.faces))
        # triangle areas → surface sampling CDF (ref: DiscreteDistribution)
        a = self.vertices[self.faces[:, 0]]
        b = self.vertices[self.faces[:, 1]]
        c = self.vertices[self.faces[:, 2]]
        self.tri_areas = 0.5 * np.linalg.norm(
            np.cross(b - a, c - a), axis=-1)
        cdf = np.cumsum(self.tri_areas)
        self.area_cdf = cdf / cdf[-1]

    def __del__(self):
        if getattr(self, "_handle", None):
            try:
                _lib().bvh_free(self._handle)
            except Exception:
                pass

    def signed_distance(self, points: np.ndarray,
                        mode: int = MODE_RAYSTAB) -> np.ndarray:
        pts = np.ascontiguousarray(points, np.float32)
        out = np.empty(len(pts), np.float32)
        _lib().bvh_signed_distance(self._handle, pts.ctypes.data, len(pts),
                                   out.ctypes.data, mode)
        return out

    def closest_points(self, points: np.ndarray):
        pts = np.ascontiguousarray(points, np.float32)
        out = np.empty_like(pts)
        tris = np.empty(len(pts), np.int32)
        _lib().bvh_closest_points(self._handle, pts.ctypes.data, len(pts),
                                  out.ctypes.data, tris.ctypes.data)
        return out, tris

    def raytrace(self, origins: np.ndarray, dirs: np.ndarray):
        o = np.ascontiguousarray(origins, np.float32)
        d = np.ascontiguousarray(dirs, np.float32)
        t = np.empty(len(o), np.float32)
        tri = np.empty(len(o), np.int32)
        nrm = np.empty_like(o)
        _lib().bvh_raytrace(self._handle, o.ctypes.data, d.ctypes.data,
                            len(o), t.ctypes.data, tri.ctypes.data,
                            nrm.ctypes.data)
        return t, tri, nrm

    def sample_surface(self, n: int, rng: np.random.Generator) -> np.ndarray:
        """Area-weighted surface samples (ref: sample_uniform_on_triangle)."""
        ti = np.searchsorted(self.area_cdf, rng.random(n))
        ti = np.clip(ti, 0, len(self.faces) - 1)
        a = self.vertices[self.faces[ti, 0]]
        b = self.vertices[self.faces[ti, 1]]
        c = self.vertices[self.faces[ti, 2]]
        u, v = rng.random((2, n)).astype(np.float32)
        flip = u + v > 1
        u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
        return (a + (b - a) * u[:, None] + (c - a) * v[:, None]).astype(np.float32)
