"""Wavefront OBJ + MTL loading (rebuild of hittable/triangular.rs:240-324).

Produces builder.Triangle DSL objects so meshes compose with transforms and
scene compilation like any other geometry. Reference semantics preserved:

  * polygon faces are fan-triangulated (the reference's `wavefront_obj` crate
    does the same before handing Triangle primitives over).
  * missing per-vertex normals -> face normal (triangular.rs:48-55), resolved
    later at scene compile; missing UVs -> default ((0,0),(1,0),(0,1))
    (triangular.rs:57-65).
  * MTL materials: only diffuse maps are honored — map_Kd becomes
    Lambertian(ImageTexture) (triangular.rs:298-312).
  * a face group whose material cannot be resolved gets the reference's
    magenta DiffuseLight debug fallback (triangular.rs:177-182). (The
    reference *panics* when a usemtl name exists without a loaded mtllib;
    we extend the fallback to that case so Normals_Try3.obj — which names a
    material but ships no .mtl — renders instead of crashing.)
  * `illum` modes other than ambient-diffuse (0/1) are rejected like the
    reference's panic on non-AmbientDiffuse (triangular.rs:300-302).

Unlike the reference (which panics on Point/Line primitives,
triangular.rs:186-191), point/line records are skipped with a count, since
they cannot contribute to a surface render.
"""

from __future__ import annotations

import os
import warnings

import numpy as np

from raytracer_weekend_tpu.scene import builder as B


def _resolve_index(idx: int, n: int) -> int:
    """OBJ indices are 1-based; negative counts from the end."""
    return idx - 1 if idx > 0 else n + idx


def load_wavefront_mtl(path: str, missing_texture_fallback=None):
    """Parse a .mtl file -> {name: Material}."""
    materials: dict[str, object] = {}
    current = None
    props: dict[str, object] = {}

    def finish():
        if current is None:
            return
        illum = props.get("illum", 1)
        if illum not in (0, 1):
            raise ValueError(
                f"material {current!r}: only ambient-diffuse illumination is "
                f"supported (illum {illum}) — triangular.rs:300-302")
        map_kd = props.get("map_Kd")
        if map_kd is not None:
            tex_path = os.path.join(os.path.dirname(path), map_kd)
            try:
                tex = B.ImageTexture(tex_path)
            except Exception:
                if missing_texture_fallback is None:
                    raise
                warnings.warn(
                    f"diffuse map {tex_path!r} unreadable; substituting solid "
                    f"{missing_texture_fallback}")
                tex = B.SolidColor(tuple(missing_texture_fallback))
            materials[current] = B.Lambertian(tex)
        else:
            kd = props.get("Kd", (1.0, 1.0, 1.0))
            materials[current] = B.Lambertian(tuple(kd))

    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "newmtl":
                finish()
                current = parts[1]
                props = {}
            elif key == "illum":
                props["illum"] = int(float(parts[1]))
            elif key == "map_Kd":
                props["map_Kd"] = parts[1]
            elif key == "Kd":
                props["Kd"] = tuple(float(x) for x in parts[1:4])
    finish()
    return materials


# The reference's debug fallback for unresolvable materials
# (triangular.rs:177-182): magenta diffuse light.
def _magenta_light():
    return B.DiffuseLight(B.SolidColor((1.0, 0.0, 1.0)))


def load_wavefront_obj(path: str, missing_texture_fallback=None):
    """Parse an .obj (+.mtl) file -> list[builder.Triangle]."""
    vertices: list = []
    normals: list = []
    texcoords: list = []
    triangles: list = []
    mtl_lib: dict | None = None
    current_material = None      # resolved Material or None
    fallback_material = None     # lazily created magenta light
    skipped = 0

    def material():
        nonlocal fallback_material
        if current_material is not None:
            return current_material
        if fallback_material is None:
            fallback_material = _magenta_light()
        return fallback_material

    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            key = parts[0]
            if key == "v":
                vertices.append(tuple(float(x) for x in parts[1:4]))
            elif key == "vn":
                normals.append(tuple(float(x) for x in parts[1:4]))
            elif key == "vt":
                texcoords.append(tuple(float(x) for x in parts[1:3]))
            elif key == "mtllib":
                mtl_path = os.path.join(os.path.dirname(path), parts[1])
                try:
                    mtl_lib = load_wavefront_mtl(
                        mtl_path,
                        missing_texture_fallback=missing_texture_fallback)
                except FileNotFoundError:
                    warnings.warn(f"mtllib {mtl_path!r} not found")
                    mtl_lib = {}
            elif key == "usemtl":
                name = parts[1]
                current_material = (mtl_lib or {}).get(name)
                if current_material is None:
                    warnings.warn(
                        f"material {name!r} unresolved; using magenta debug "
                        "light (triangular.rs:177-182)")
            elif key == "f":
                corners = []
                for spec in parts[1:]:
                    fields = spec.split("/")
                    vi = _resolve_index(int(fields[0]), len(vertices))
                    ti = None
                    ni = None
                    if len(fields) > 1 and fields[1]:
                        ti = _resolve_index(int(fields[1]), len(texcoords))
                    if len(fields) > 2 and fields[2]:
                        ni = _resolve_index(int(fields[2]), len(normals))
                    corners.append((vi, ti, ni))
                # Fan triangulation of polygons.
                for k in range(1, len(corners) - 1):
                    tri = (corners[0], corners[k], corners[k + 1])
                    verts = tuple(vertices[vi] for vi, _, _ in tri)
                    uvs = tuple(
                        texcoords[ti] if ti is not None else None
                        for _, ti, _ in tri)
                    nrms = tuple(
                        normals[ni] if ni is not None else None
                        for _, _, ni in tri)
                    triangles.append(B.Triangle(
                        vertices=verts, material=material(),
                        normals=nrms, uvs=uvs))
            elif key in ("p", "l"):
                skipped += 1

    if skipped:
        warnings.warn(f"{path}: skipped {skipped} point/line primitives")
    return triangles
