"""Isosurface extraction + PLY export (optional mesh utility)."""
import os

import numpy as np

from localrf_tpu.utils.mesh import marching_tetrahedra, write_ply


def test_sphere_isosurface():
    n = 20
    ax = np.linspace(-1, 1, n)
    z, y, x = np.meshgrid(ax, ax, ax, indexing="ij")
    vals = 1.0 - np.sqrt(x**2 + y**2 + z**2)
    verts, faces = marching_tetrahedra(vals, 0.5)
    assert len(verts) > 100 and len(faces) > 100
    world = (verts / (n - 1)) * 2 - 1
    r = np.linalg.norm(world, axis=1)
    assert abs(float(r.mean()) - 0.5) < 0.05
    assert float(r.std()) < 0.05


def test_empty_volume():
    vals = np.zeros((8, 8, 8))
    verts, faces = marching_tetrahedra(vals, 0.5)
    assert len(verts) == 0 and len(faces) == 0


def test_write_ply(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]])
    path = str(tmp_path / "tri.ply")
    write_ply(path, verts, faces)
    text = open(path).read()
    assert text.startswith("ply") and "element vertex 3" in text
