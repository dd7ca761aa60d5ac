"""Second, independently-written scalar oracle (VERDICT r3 missing #1).

All image parity in this repo is checked against tests/oracle.py, which was
written from the same SURVEY-level understanding as the renderer — a shared
misreading of the Rust (another log10-class quirk) would pass every gate.
This file is a separate authoring pass transcribed DIRECTLY from the
reference sources, structured like the Rust itself (trait-style objects
with `hit`, materials with `scatter`, recursive `sample_ray`, sequential
closest-hit list scan), consuming the scene *description* (the builder
object list) rather than the compiled SoA tables that oracle.py reads.

Shared with the rest of the repo ONLY:
  * the counter-based RNG spec (rng.rand4 keyed on (seed, ray_id, bounce,
    salt) + the closed-form samplers) — the reference's stateful
    ThreadRng/SmallRng cannot be matched value-for-value, so the RNG
    protocol is the repo-wide spec; everything downstream of the drawn
    uniforms is transcribed fresh.
  * numpy.

Transcription anchors (reference file:line):
  sample_ray / miss->background / emitted + att * recurse   lib.rs:97-117
  closest-hit list scan with narrowing t_max                hittable/mod.rs:56-69
  front-face flip                                           hittable/mod.rs:30-48
  sphere quadratic + UV                                     spherical.rs:18-98
  moving sphere center lerp                                 spherical.rs:117-125
  XY/XZ/YZ rectangles                                       rectangular.rs:27-167
  translation / Y-rotation (ray-space)                      transformations.rs:23-153
  constant medium incl. the log10 quirk                     volumes.rs:38-78
  Lambertian/Metal/Dielectric/Isotropic                     material.rs:42-163
  DiffuseLight                                              light_source.rs:12-26
  Solid/Checker/Noise/UVDebug textures                      texture.rs:45-104
  thin-lens camera                                          camera.rs:23-74
"""

from __future__ import annotations

import dataclasses
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from raytracer_weekend_tpu import rng as rt_rng  # noqa: E402  (RNG spec)
from raytracer_weekend_tpu import perlin as rt_perlin  # noqa: E402


def _r4(seed, ray_id, bounce, salt):
    import jax.numpy as jnp

    out = rt_rng.rand4(jnp.uint32(seed), jnp.uint32(ray_id),
                       jnp.uint32(bounce), salt)
    return np.asarray(out, dtype=np.float64)


def _unit_sphere(u1, u2, u3):
    import jax.numpy as jnp

    v = rt_rng.in_unit_sphere_from_uniforms(
        jnp.float32(u1), jnp.float32(u2), jnp.float32(u3))
    return np.asarray(v, dtype=np.float64)


def _unit_vector(u1, u2):
    import jax.numpy as jnp

    v = rt_rng.unit_vector_from_uniforms(jnp.float32(u1), jnp.float32(u2))
    return np.asarray(v, dtype=np.float64)


def _unit_disk(u1, u2):
    import jax.numpy as jnp

    v = rt_rng.in_unit_disk_from_uniforms(jnp.float32(u1), jnp.float32(u2))
    return np.asarray(v, dtype=np.float64)


def _norm(v):
    return v / math.sqrt(float(v @ v))


# ---------------------------------------------------------------------------
# Textures (texture.rs)
# ---------------------------------------------------------------------------

class Solid2:
    def __init__(self, rgb):
        self.rgb = np.asarray(rgb, np.float64)

    def value(self, u, v, p):
        return self.rgb


class Checker2:
    def __init__(self, even, odd, frequency):
        self.even, self.odd, self.freq = even, odd, frequency

    def value(self, u, v, p):
        sines = (math.sin(self.freq * p[0]) * math.sin(self.freq * p[1])
                 * math.sin(self.freq * p[2]))
        return (self.odd if sines < 0.0 else self.even).value(u, v, p)


class Noise2:
    def __init__(self, scale, grad, perm):
        self.scale, self.grad, self.perm = scale, grad, perm

    def value(self, u, v, p):
        import jax.numpy as jnp

        turb = float(rt_perlin.turbulence(
            jnp.asarray(self.grad), jnp.asarray(self.perm),
            jnp.asarray(p, jnp.float32)[None, :], depth=7)[0])
        s = 0.5 * (1.0 + math.sin(self.scale * p[2] + 10.0 * turb))
        return np.array([s, s, s])


class UVDebug2:
    def value(self, u, v, p):
        return np.array([u, v, 0.0])


# ---------------------------------------------------------------------------
# Materials (material.rs / light_source.rs)
# ---------------------------------------------------------------------------

class Lambertian2:
    def __init__(self, albedo):
        self.albedo = albedo

    def scatter(self, d_in, rec, seed, ray_id, bounce):
        u = _r4(seed, ray_id, bounce, rt_rng.SALT_LAMBERTIAN)
        direction = rec["normal"] + _unit_vector(u[0], u[1])
        if np.all(np.abs(direction) < 1e-8):     # is_near_zero
            direction = rec["normal"]
        att = self.albedo.value(rec["u"], rec["v"], rec["p"])
        return att, direction

    def emitted(self, rec):
        return np.zeros(3)


class Metal2:
    def __init__(self, albedo, fuzz):
        assert fuzz <= 1.0
        self.albedo, self.fuzz = albedo, fuzz

    def scatter(self, d_in, rec, seed, ray_id, bounce):
        u = _r4(seed, ray_id, bounce, rt_rng.SALT_METAL)
        unit = _norm(d_in)
        n = rec["normal"]
        reflected = unit - 2.0 * (unit @ n) * n
        direction = reflected + self.fuzz * _unit_sphere(u[0], u[1], u[2])
        if direction @ n > 0.0:
            return self.albedo.value(rec["u"], rec["v"], rec["p"]), direction
        return None                               # absorbed

    def emitted(self, rec):
        return np.zeros(3)


class Dielectric2:
    def __init__(self, ir):
        self.ir = ir

    def scatter(self, d_in, rec, seed, ray_id, bounce):
        u = _r4(seed, ray_id, bounce, rt_rng.SALT_DIELECTRIC)
        ratio = (1.0 / self.ir) if rec["front"] else self.ir
        unit = _norm(d_in)
        n = rec["normal"]
        cos_theta = min(-(unit @ n), 1.0)
        sin_theta = math.sqrt(max(0.0, 1.0 - cos_theta * cos_theta))
        r0 = ((1.0 - ratio) / (1.0 + ratio)) ** 2
        reflectance = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
        if ratio * sin_theta > 1.0 or reflectance > u[0]:
            direction = unit - 2.0 * (unit @ n) * n
        else:
            perp = ratio * (unit + cos_theta * n)
            par = -math.sqrt(abs(1.0 - float(perp @ perp))) * n
            direction = perp + par
        return np.ones(3), direction

    def emitted(self, rec):
        return np.zeros(3)


class DiffuseLight2:
    def __init__(self, emit):
        self.emit = emit

    def scatter(self, d_in, rec, seed, ray_id, bounce):
        return None                               # light_source.rs:18-20

    def emitted(self, rec):
        return self.emit.value(rec["u"], rec["v"], rec["p"])


class Isotropic2:
    def __init__(self, albedo):
        self.albedo = albedo

    def scatter(self, d_in, rec, seed, ray_id, bounce):
        u = _r4(seed, ray_id, bounce, rt_rng.SALT_ISOTROPIC)
        return (self.albedo.value(rec["u"], rec["v"], rec["p"]),
                _unit_sphere(u[0], u[1], u[2]))

    def emitted(self, rec):
        return np.zeros(3)


# ---------------------------------------------------------------------------
# Hittables
# ---------------------------------------------------------------------------

def _sphere_hit(o, d, t_min, t_max, center, radius, material):
    oc = o - center
    a = float(d @ d)
    half_b = float(oc @ d)
    c = float(oc @ oc) - radius * radius
    disc = half_b * half_b - a * c
    if disc < 0.0:
        return None
    sq = math.sqrt(disc)
    root = (-half_b - sq) / a
    if root < t_min or t_max < root:
        root = (-half_b + sq) / a
        if root < t_min or t_max < root:
            return None
    p = o + root * d
    outward = (p - center) / radius
    theta = math.acos(max(-1.0, min(1.0, -outward[1])))
    phi = math.atan2(-outward[2], outward[0]) + math.pi
    u = phi / (2.0 * math.pi)
    v = theta / math.pi
    return _face(p, root, u, v, material, d, outward)


def _face(p, t, u, v, material, d, outward):
    front = float(d @ outward) < 0.0
    normal = outward if front else -outward
    return dict(p=p, t=t, u=u, v=v, material=material, normal=normal,
                front=front)


class Sphere2:
    def __init__(self, center, radius, material):
        self.center = np.asarray(center, np.float64)
        self.radius = radius
        self.material = material

    def hit(self, o, d, time, t_min, t_max, ctx):
        return _sphere_hit(o, d, t_min, t_max, self.center, self.radius,
                           self.material)


class MovingSphere2:
    def __init__(self, c0, t0, c1, t1, radius, material):
        self.c0 = np.asarray(c0, np.float64)
        self.c1 = np.asarray(c1, np.float64)
        self.t0, self.t1 = t0, t1
        self.radius, self.material = radius, material

    def hit(self, o, d, time, t_min, t_max, ctx):
        center = self.c0 + ((time - self.t0) / (self.t1 - self.t0)) * (
            self.c1 - self.c0)
        return _sphere_hit(o, d, t_min, t_max, center, self.radius,
                           self.material)


class _Rect2:
    """axes: (a, b, fixed) coordinate indices + outward normal axis."""

    def __init__(self, a_ax, b_ax, f_ax, a0, a1, b0, b1, k, material):
        self.a_ax, self.b_ax, self.f_ax = a_ax, b_ax, f_ax
        self.a0, self.a1, self.b0, self.b1, self.k = a0, a1, b0, b1, k
        self.material = material

    def hit(self, o, d, time, t_min, t_max, ctx):
        if d[self.f_ax] == 0.0:
            return None
        t = (self.k - o[self.f_ax]) / d[self.f_ax]
        if t < t_min or t > t_max:
            return None
        a = o[self.a_ax] + t * d[self.a_ax]
        b = o[self.b_ax] + t * d[self.b_ax]
        if a < self.a0 or a > self.a1 or b < self.b0 or b > self.b1:
            return None
        u = (a - self.a0) / (self.a1 - self.a0)
        v = (b - self.b0) / (self.b1 - self.b0)
        outward = np.zeros(3)
        outward[self.f_ax] = 1.0
        p = o + t * d
        return _face(p, t, u, v, self.material, d, outward)


def XYRect2(x0, x1, y0, y1, k, m):
    return _Rect2(0, 1, 2, x0, x1, y0, y1, k, m)    # rectangular.rs:27-66


def XZRect2(x0, x1, z0, z1, k, m):
    return _Rect2(0, 2, 1, x0, x1, z0, z1, k, m)    # rectangular.rs:78-117


def YZRect2(y0, y1, z0, z1, k, m):
    return _Rect2(1, 2, 0, y0, y1, z0, z1, k, m)    # rectangular.rs:129-167


class Triangle2:
    """Möller–Trumbore via the reference's determinant form
    (triangular.rs:97-138)."""

    def __init__(self, v0, v1, v2, n=None, uv=None, material=None):
        self.v0 = np.asarray(v0, np.float64)
        self.v1 = np.asarray(v1, np.float64)
        self.v2 = np.asarray(v2, np.float64)
        self.n = n            # per-vertex normals (3, 3) or None
        self.uv = uv          # per-vertex uv (3, 2) or None
        self.material = material

    def hit(self, o, d, time, t_min, t_max, ctx):
        ab = self.v1 - self.v0
        ac = self.v2 - self.v0
        n = np.cross(ab, ac)
        det = -float(d @ n)
        if det == 0.0:
            return None
        ao = o - self.v0
        dao = np.cross(ao, d)
        invdet = 1.0 / det
        u = float(ac @ dao) * invdet
        v = -float(ab @ dao) * invdet
        t = float(ao @ n) * invdet
        if not (t >= t_min and t <= t_max and u >= 0.0 and v >= 0.0
                and (u + v) <= 1.0):
            return None
        p = o + t * d
        if self.n is None:
            outward = n
        else:
            outward = (self.n[0] + u * (self.n[1] - self.n[0])
                       + v * (self.n[2] - self.n[0]))
        if self.uv is None:
            tu, tv = u, v
        else:
            uv = (self.uv[0] + u * (self.uv[1] - self.uv[0])
                  + v * (self.uv[2] - self.uv[0]))
            tu, tv = float(uv[0]), float(uv[1])
        return _face(p, t, tu, tv, self.material, d, outward)


class Translate2:
    def __init__(self, inner, offset):
        self.inner = inner
        self.offset = np.asarray(offset, np.float64)

    def hit(self, o, d, time, t_min, t_max, ctx):
        rec = self.inner.hit(o - self.offset, d, time, t_min, t_max, ctx)
        if rec is None:
            return None
        p = rec["p"] + self.offset
        return _face(p, rec["t"], rec["u"], rec["v"], rec["material"],
                     d, rec["normal"] if rec["front"] else -rec["normal"])


class RotateY2:
    def __init__(self, inner, angle_degrees):
        self.inner = inner
        rad = math.radians(angle_degrees)
        self.sin, self.cos = math.sin(rad), math.cos(rad)

    def hit(self, o, d, time, t_min, t_max, ctx):
        s, c = self.sin, self.cos
        ro = o.copy()
        rd = d.copy()
        ro[0] = c * o[0] - s * o[2]
        ro[2] = s * o[0] + c * o[2]
        rd[0] = c * d[0] - s * d[2]
        rd[2] = s * d[0] + c * d[2]
        rec = self.inner.hit(ro, rd, time, t_min, t_max, ctx)
        if rec is None:
            return None
        p = rec["p"].copy()
        outward = (rec["normal"] if rec["front"]
                   else -rec["normal"]).copy()
        p0, p2 = p[0], p[2]
        p[0] = c * p0 + s * p2
        p[2] = -s * p0 + c * p2
        n0, n2 = outward[0], outward[2]
        outward[0] = c * n0 + s * n2
        outward[2] = -s * n0 + c * n2
        # NB: the reference flips the face against the ROTATED ray
        # (transformations.rs:141-149 passes rotated_r).
        return _face(p, rec["t"], rec["u"], rec["v"], rec["material"],
                     rd, outward)


class ConstantMedium2:
    def __init__(self, boundary, density, albedo_texture, vol_index):
        self.boundary = boundary
        self.neg_inv_density = -1.0 / density
        self.phase = Isotropic2(albedo_texture)
        self.vol_index = vol_index      # RNG stream id (repo spec)

    def hit(self, o, d, time, t_min, t_max, ctx):
        rec1 = self.boundary.hit(o, d, time, -math.inf, math.inf, ctx)
        if rec1 is None:
            return None
        rec2 = self.boundary.hit(o, d, time, rec1["t"] + 0.0001, math.inf,
                                 ctx)
        if rec2 is None:
            return None
        t1 = max(rec1["t"], t_min)
        t2 = min(rec2["t"], t_max)
        if t1 >= t2:
            return None
        t1 = max(t1, 0.0)
        ray_length = math.sqrt(float(d @ d))
        distance_inside = (t2 - t1) * ray_length
        u = _r4(ctx["seed"], ctx["ray_id"], ctx["bounce"],
                rt_rng.SALT_VOLUME + self.vol_index)[0]
        u = max(float(u), 1e-12)
        # volumes.rs:58 uses log10, NOT ln — the reference quirk.
        hit_distance = self.neg_inv_density * math.log10(u)
        if hit_distance > distance_inside:
            return None
        t = t1 + hit_distance / ray_length
        p = o + t * d
        return dict(p=p, t=t, u=0.0, v=0.0, material=self.phase,
                    normal=np.array([1.0, 0.0, 0.0]), front=True)


# ---------------------------------------------------------------------------
# Renderer (lib.rs / camera.rs / console_app main.rs)
# ---------------------------------------------------------------------------

class Oracle2:
    def __init__(self, objects, background):
        self.objects = objects
        self.background = np.asarray(background, np.float64)

    def world_hit(self, o, d, time, t_min, t_max, ctx):
        """hittable/mod.rs:56-69: sequential scan, narrowing t_max."""
        closest = t_max
        rec = None
        for obj in self.objects:
            r = obj.hit(o, d, time, t_min, closest, ctx)
            if r is not None:
                closest = r["t"]
                rec = r
        return rec

    def sample_ray(self, o, d, time, seed, ray_id, bounce, depth_left):
        if depth_left == 0:
            return np.zeros(3)
        ctx = dict(seed=seed, ray_id=ray_id, bounce=bounce)
        rec = self.world_hit(o, d, time, 1e-3, math.inf, ctx)
        if rec is None:
            return self.background.copy()
        emitted = rec["material"].emitted(rec)
        sc = rec["material"].scatter(d, rec, seed, ray_id, bounce)
        if sc is None:
            return emitted
        att, new_d = sc
        return emitted + att * self.sample_ray(
            rec["p"], new_d, time, seed, ray_id, bounce + 1,
            depth_left - 1)

    def render(self, cam_params, width, height, spp, max_depth, seed):
        """Per-pixel color SUMS (not yet tone mapped), (H, W, 3).

        cam_params: (look_from, look_at, up, vfov, aspect, aperture,
        focus_dist, time0, time1) — camera.rs:23-74 transcription.
        """
        (look_from, look_at, up, vfov, aspect, aperture, focus,
         time0, time1) = cam_params
        look_from = np.asarray(look_from, np.float64)
        theta = math.radians(vfov)
        h = math.tan(theta / 2.0)
        vp_h = 2.0 * h
        vp_w = aspect * vp_h
        w = _norm(look_from - np.asarray(look_at, np.float64))
        u = _norm(np.cross(np.asarray(up, np.float64), w))
        v = np.cross(w, u)
        origin = look_from
        horizontal = focus * vp_w * u
        vertical = focus * vp_h * v
        lower_left = origin - horizontal / 2 - vertical / 2 - focus * w
        lens_radius = aperture / 2.0

        img = np.zeros((height, width, 3))
        for row in range(height):
            for col in range(width):
                pix = row * width + col
                acc = np.zeros(3)
                for samp in range(spp):
                    ray_id = pix * spp + samp
                    j = _r4(seed, ray_id, 0, rt_rng.SALT_PIXEL_JITTER)
                    # integrator._pixel_rays: bottom-up rows, jitter in
                    # [0,1), s over (W-1)/(H-1) like main.rs' loop.
                    s = (col + j[0]) / (width - 1)
                    t = ((height - 1 - row) + j[1]) / (height - 1)
                    lu = _r4(seed, ray_id, 0, rt_rng.SALT_LENS)
                    rd = lens_radius * _unit_disk(lu[0], lu[1])
                    offset = u * rd[0] + v * rd[1]
                    tu = _r4(seed, ray_id, 0, rt_rng.SALT_TIME)
                    time = time0 + tu[0] * (time1 - time0)
                    o = origin + offset
                    d = (lower_left + s * horizontal + t * vertical
                         - origin - offset)
                    acc += self.sample_ray(o, d, time, seed, ray_id, 0,
                                           max_depth)
                img[row, col] = acc
        return img


def from_builder(objects, vol_counter=None):
    """Adapt the scene-description builder objects (scene/builder.py) to
    oracle2 hittables — the shared scene SPEC, not the compiled tables."""
    from raytracer_weekend_tpu.scene import builder as B

    grad, perm = rt_perlin.make_perlin_tables(7)
    vol_idx = vol_counter if vol_counter is not None else [0]

    def tex(t):
        t = B._as_texture(t)
        if isinstance(t, B.SolidColor):
            return Solid2(t.color)
        if isinstance(t, B.Checker):
            return Checker2(tex(t.even), tex(t.odd), t.frequency)
        if isinstance(t, B.NoiseTexture):
            return Noise2(t.scale, grad, perm)
        if isinstance(t, B.UVDebug):
            return UVDebug2()
        raise NotImplementedError(type(t))

    def mat(m):
        if isinstance(m, B.Lambertian):
            return Lambertian2(tex(m.albedo))
        if isinstance(m, B.Metal):
            return Metal2(tex(m.albedo), m.fuzz)
        if isinstance(m, B.Dielectric):
            return Dielectric2(m.ior)
        if isinstance(m, B.DiffuseLight):
            return DiffuseLight2(tex(m.emit))
        if isinstance(m, B.Isotropic):
            return Isotropic2(tex(m.albedo))
        raise NotImplementedError(type(m))

    def wrap(obj, inner):
        # The builder composes one rigid transform per object:
        # world = R(theta) x + offset — apply as the reference nests
        # them (rotate inner, translate outer; transformations.rs).
        theta = float(getattr(obj, "theta", 0.0) or 0.0)
        if theta:
            inner = RotateY2(inner, theta)
        off = np.asarray(getattr(obj, "offset", (0.0, 0.0, 0.0)),
                         np.float64)
        if np.any(off != 0.0):
            inner = Translate2(inner, off)
        return inner

    out = []
    for obj in objects:
        if isinstance(obj, B.Sphere):
            base = Sphere2(obj.center, obj.radius, mat(obj.material))
        elif isinstance(obj, B.MovingSphere):
            base = MovingSphere2(obj.center0, obj.time0, obj.center1,
                                 obj.time1, obj.radius, mat(obj.material))
        elif isinstance(obj, B.Cuboid):
            # sides() already carry the cuboid's composed transform;
            # wrap() below must NOT re-apply it, so strip it here and
            # wrap the whole list once.
            plain = [dataclasses.replace(r, theta=0.0,
                                         offset=(0.0, 0.0, 0.0))
                     for r in obj.sides()]
            inner = _List2(from_builder(plain, vol_idx))
            out.append(wrap(obj, inner))
            continue
        elif isinstance(obj, B.Triangle):
            nrm = obj.normals
            nrm = (None if nrm is None or all(n is None for n in nrm)
                   else np.asarray(nrm, np.float64))
            uvs = obj.uvs
            uvs = (None if uvs is None or all(u is None for u in uvs)
                   else np.asarray(uvs, np.float64))
            base = Triangle2(obj.vertices[0], obj.vertices[1],
                             obj.vertices[2], nrm, uvs,
                             mat(obj.material))
        elif isinstance(obj, B.ConstantMedium):
            inner = from_builder([obj.boundary], vol_idx)[0]
            i = vol_idx[0]
            vol_idx[0] += 1
            base = ConstantMedium2(inner, obj.density,
                                   tex(obj.texture), i)
        elif hasattr(obj, "axis"):      # _Rect
            ctor = {0: YZRect2, 1: XZRect2, 2: XYRect2}[obj.axis]
            base = ctor(obj.a0, obj.a1, obj.b0, obj.b1, obj.k,
                        mat(obj.material))
        else:
            raise NotImplementedError(type(obj))
        out.append(wrap(obj, base))
    return out


class _List2:
    """Inner hittable list (a cuboid's six rects; hittable/mod.rs:56-69)."""

    def __init__(self, objects):
        self.objects = objects

    def hit(self, o, d, time, t_min, t_max, ctx):
        closest = t_max
        rec = None
        for obj in self.objects:
            r = obj.hit(o, d, time, t_min, closest, ctx)
            if r is not None:
                closest = r["t"]
                rec = r
        return rec
