"""Multi-host rendering over jax.distributed (the DCN path).

Single-process renders use parallel.shard directly; across hosts the same
shard_map runs over a global mesh, with each process contributing its
addressable slice of the film and the scene replicated everywhere. The
BASELINE.md scaling config (1 host -> >=2 hosts at >=90% efficiency) runs
through exactly this path; tests simulate it with two CPU processes and TCP
collectives (tests/test_multihost.py).

Usage (per host):
    init_multihost(coordinator_address="host0:1234",
                   num_processes=N, process_id=i)
    img = render_multihost(scene, static, cfg, cam)   # full image, all hosts
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from raytracer_weekend_tpu.parallel.mesh import RenderMesh
from raytracer_weekend_tpu.parallel.shard import render_sharded


def init_multihost(coordinator_address: str, num_processes: int,
                   process_id: int, **kw) -> None:
    """Cluster bring-up (SURVEY.md §2.6: absent in the reference — the
    embedded analog is heap/clock/USART init, bin/raytracer.rs:45-51)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def global_render_mesh(shape: Optional[tuple[int, int, int]] = None
                       ) -> RenderMesh:
    """A (rays, spp, geom) mesh over every device of every process, rays
    leading so film shards ride hosts (gradients/results cross DCN once)."""
    devices = np.asarray(jax.devices())
    n = devices.size
    if shape is None:
        shape = (n, 1, 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} global devices")
    return RenderMesh(mesh=Mesh(devices.reshape(shape),
                                ("rays", "spp", "geom")))


def _replicate(tree, mesh: Mesh):
    """Device-put every leaf as a fully-replicated global array."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        if x is None:
            return None
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda i: x[i])

    return jax.tree_util.tree_map(put, tree)


def render_multihost(scene, static, cfg, cam,
                     rmesh: Optional[RenderMesh] = None,
                     seed: Optional[int] = None) -> np.ndarray:
    """Full-frame render across all processes -> (H, W, 3) color sums,
    identical on every host (and to the single-device render)."""
    from jax.experimental import multihost_utils

    rmesh = rmesh or global_render_mesh()
    mesh = rmesh.mesh

    scene_g = _replicate(scene, mesh)
    cam_g = _replicate(cam, mesh)

    # Global pixel/sample index arrays, sharded like render_sharded expects.
    n_pix = cfg.n_pixels
    spp = cfg.samples_per_pixel
    pix_pad = -(-n_pix // rmesh.n_rays) * rmesh.n_rays
    spp_pad = -(-spp // rmesh.n_spp) * rmesh.n_spp

    pix_ids = np.arange(pix_pad, dtype=np.int32)
    sample_ids = np.arange(spp_pad, dtype=np.int32)
    pix_g = jax.make_array_from_callback(
        (pix_pad,), NamedSharding(mesh, P("rays")),
        lambda idx: pix_ids[idx])
    smp_g = jax.make_array_from_callback(
        (spp_pad,), NamedSharding(mesh, P("spp")),
        lambda idx: sample_ids[idx])

    sums = _render_global(scene_g, static, cfg, cam_g, rmesh, pix_g, smp_g,
                          jnp.uint32(cfg.seed if seed is None else seed))
    # Bring the film shards to every host.
    local = multihost_utils.process_allgather(sums, tiled=True)
    return np.asarray(local)[:n_pix].reshape(cfg.height, cfg.width, 3)


def _render_global(scene, static, cfg, cam, rmesh, pix_g, smp_g, seed):
    """The shard_map body of parallel.shard, invoked on global arrays."""
    from raytracer_weekend_tpu.parallel import shard as shard_mod

    # Reuse render_sharded's internals by calling its shard body through
    # the same construction; render_sharded builds its own index arrays, so
    # inline the equivalent here with the global ones.
    import functools

    from jax.experimental.shard_map import shard_map

    from raytracer_weekend_tpu import rng as rt_rng
    from raytracer_weekend_tpu.camera import get_rays
    from raytracer_weekend_tpu.integrator import trace_rays

    mesh = rmesh.mesh
    n_pix = cfg.n_pixels
    spp = cfg.samples_per_pixel
    geom = rmesh.geom_axis if rmesh.n_geom > 1 else None
    scene_spec = shard_mod._scene_specs(rmesh, scene)
    cam_spec = type(cam)(*[P() for _ in cam._fields])

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(scene_spec, cam_spec, P(rmesh.ray_axis), P(rmesh.spp_axis)),
        out_specs=P(rmesh.ray_axis, None),
        check_rep=False,
    )
    def body(scene, cam, pix_local, sample_local):
        Pl = pix_local.shape[0]
        Sl = sample_local.shape[0]
        pix = jnp.repeat(pix_local, Sl)
        smp = jnp.tile(sample_local, Pl)
        lane_valid = (pix < n_pix) & (smp < spp)
        ray_id = (pix * spp + jnp.minimum(smp, spp - 1)).astype(jnp.uint32)
        col = (pix % cfg.width).astype(jnp.float32)
        row = (cfg.height - 1 - pix // cfg.width).astype(jnp.float32)
        uj = rt_rng.rand4(seed, ray_id, 0, rt_rng.SALT_PIXEL_JITTER)
        u = (col + uj[..., 0]) / (cfg.width - 1)
        v = (row + uj[..., 1]) / (cfg.height - 1)
        o, d, time = get_rays(cam, u, v, seed, ray_id)
        colors = trace_rays(scene, static, cfg, o, d, time, ray_id, seed,
                            geom_axis=geom)
        colors = jnp.where(lane_valid[:, None], colors, 0.0)
        sums = colors.reshape(Pl, Sl, 3).sum(axis=1)
        return jax.lax.psum(sums, rmesh.spp_axis)

    return jax.jit(body)(scene, cam, pix_g, smp_g)
