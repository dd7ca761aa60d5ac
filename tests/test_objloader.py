"""OBJ/MTL loader unit tests (reference semantics, triangular.rs:169-324)."""

import numpy as np
import pytest

from raytracer_weekend_tpu.scene import builder as B
from raytracer_weekend_tpu.scene.objloader import (
    load_wavefront_mtl, load_wavefront_obj,
)


def test_basic_triangles_and_indices(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\n"
        "vn 0 0 1\n"
        "f 1/1/1 2/2/1 3/3/1\n"
        "f -3 -2 -1\n"            # negative indices: last three vertices
    )
    tris = load_wavefront_obj(str(obj))
    assert len(tris) == 2
    t0 = tris[0]
    assert t0.uvs == ((0.0, 0.0), (1.0, 0.0), (0.0, 1.0))
    assert t0.normals == ((0.0, 0.0, 1.0),) * 3
    t1 = tris[1]
    assert t1.vertices == ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (1.0, 1.0, 0.0))
    assert t1.normals == (None, None, None)  # face-normal fallback at build


def test_quad_fan_triangulation(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n")
    tris = load_wavefront_obj(str(obj))
    assert len(tris) == 2
    assert tris[0].vertices[0] == (0.0, 0.0, 0.0)
    assert tris[1].vertices == ((0.0, 0.0, 0.0), (1.0, 1.0, 0.0),
                                (0.0, 1.0, 0.0))


def test_missing_material_magenta_light(tmp_path):
    # No mtllib at all -> magenta DiffuseLight debug fallback
    # (triangular.rs:177-182).
    obj = tmp_path / "nomat.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    tris = load_wavefront_obj(str(obj))
    mat = tris[0].material
    assert isinstance(mat, B.DiffuseLight)
    assert mat.emit.color == (1.0, 0.0, 1.0)


def test_mtl_diffuse_color_and_map(tmp_path):
    mtl = tmp_path / "m.mtl"
    mtl.write_text(
        "newmtl plain\nKd 0.2 0.4 0.6\nillum 1\n"
        "newmtl mapped\nillum 1\nmap_Kd missing.png\n")
    mats = load_wavefront_mtl(str(mtl),
                              missing_texture_fallback=(0.5, 0.5, 0.5))
    assert isinstance(mats["plain"], B.Lambertian)
    assert mats["plain"].albedo.color == (0.2, 0.4, 0.6)
    # Unreadable map falls back to the provided solid color.
    assert mats["mapped"].albedo.color == (0.5, 0.5, 0.5)


def test_mtl_unsupported_illum_rejected(tmp_path):
    mtl = tmp_path / "bad.mtl"
    mtl.write_text("newmtl shiny\nillum 2\nKd 1 1 1\n")
    with pytest.raises(ValueError, match="illum"):
        load_wavefront_mtl(str(mtl))


def test_usemtl_resolves_materials(tmp_path):
    (tmp_path / "lib.mtl").write_text("newmtl red\nKd 1 0 0\nillum 1\n")
    obj = tmp_path / "o.obj"
    obj.write_text(
        "mtllib lib.mtl\nusemtl red\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    tris = load_wavefront_obj(str(obj))
    assert isinstance(tris[0].material, B.Lambertian)
    assert tris[0].material.albedo.color == (1.0, 0.0, 0.0)


def test_points_and_lines_skipped(tmp_path):
    obj = tmp_path / "pl.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\np 1\nl 1 2\nf 1 2 3\n")
    with pytest.warns(UserWarning, match="point/line"):
        tris = load_wavefront_obj(str(obj))
    assert len(tris) == 1
