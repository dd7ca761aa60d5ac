"""Thin-lens look-at camera with defocus blur and a shutter interval.

Rebuild of camera.rs:23-74. The camera is a small pytree of arrays so it can
sit inside jit-ed render functions and be differentiated; `get_rays` is fully
vectorized over a megabatch of film samples instead of producing one Ray.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from raytracer_weekend_tpu import rng as rt_rng
from raytracer_weekend_tpu.vecmath import cross, normalize


class Camera(NamedTuple):
    """Precomputed camera frame (ref Camera struct, camera.rs:10-21)."""

    origin: Array        # (3,)
    lower_left: Array    # (3,)
    horizontal: Array    # (3,)
    vertical: Array      # (3,)
    u: Array             # (3,) lens basis
    v: Array             # (3,)
    lens_radius: Array   # ()
    time0: Array         # ()
    time1: Array         # ()


def make_camera(
    look_from,
    look_at,
    up_vector=(0.0, 1.0, 0.0),
    vertical_field_of_view: float = 40.0,
    aspect_ratio: float = 16.0 / 9.0,
    aperture: float = 0.0,
    focus_dist: float = 10.0,
    time0: float = 0.0,
    time1: float = 1.0,
) -> Camera:
    """Construct the camera frame. Mirrors Camera::new (camera.rs:23-64)."""
    look_from = jnp.asarray(look_from, jnp.float32)
    look_at = jnp.asarray(look_at, jnp.float32)
    up_vector = jnp.asarray(up_vector, jnp.float32)

    theta = jnp.deg2rad(jnp.float32(vertical_field_of_view))
    h = jnp.tan(theta / 2.0)
    viewport_height = 2.0 * h
    viewport_width = aspect_ratio * viewport_height

    w = normalize(look_from - look_at)
    u = normalize(cross(up_vector, w))
    v = cross(w, u)

    origin = look_from
    horizontal = focus_dist * viewport_width * u
    vertical = focus_dist * viewport_height * v
    lower_left = origin - horizontal / 2.0 - vertical / 2.0 - focus_dist * w

    return Camera(
        origin=origin,
        lower_left=lower_left,
        horizontal=horizontal,
        vertical=vertical,
        u=u,
        v=v,
        lens_radius=jnp.float32(aperture / 2.0),
        time0=jnp.float32(time0),
        time1=jnp.float32(time1),
    )


def get_rays(cam: Camera, s: Array, t: Array, seed, ray_id: Array):
    """Generate a megabatch of primary rays (ref get_ray, camera.rs:66-74).

    Args:
      cam: the camera.
      s, t: film coordinates in [0,1], shape (B,).
      seed, ray_id: counter-based RNG keys; lens-disk sample and shutter time
        replace `rng` in the reference signature.

    Returns:
      (origins (B,3), directions (B,3), times (B,)). Directions are
      intentionally NOT normalized, matching the reference (camera.rs:68-73):
      all hit kernels work in units of |d|.
    """
    u_lens = rt_rng.rand4(seed, ray_id, 0, rt_rng.SALT_LENS)
    rd = cam.lens_radius * rt_rng.in_unit_disk_from_uniforms(
        u_lens[..., 0], u_lens[..., 1]
    )
    offset = cam.u * rd[..., 0:1] + cam.v * rd[..., 1:2]

    u_time = rt_rng.rand4(seed, ray_id, 0, rt_rng.SALT_TIME)[..., 0]
    times = cam.time0 + u_time * (cam.time1 - cam.time0)

    origins = cam.origin + offset
    directions = (
        cam.lower_left
        + s[..., None] * cam.horizontal
        + t[..., None] * cam.vertical
        - cam.origin
        - offset
    )
    return origins, directions, times
