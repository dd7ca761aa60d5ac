"""Stackless BVH traversal over ray megabatches.

Rebuild of BvhNode::hit (bvh.rs:101-120). The reference recurses through
boxed child pointers; here the tree is the flat DFS skip-link layout emitted
by native.build_bvh (one array of nodes, `skip[i]` jumping over node i's
subtree), and traversal is a vectorized `lax.while_loop`: every ray carries
its own cursor, advancing one node per iteration in lockstep —

    hit(bbox_i)?  cursor+1  (and test the primitive when i is a leaf)
               :  cursor = skip[i]

The reference's early-tightening (t_max narrowed by the left hit,
bvh.rs:107-110) falls out naturally: the slab test prunes against the
current best t.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

_INF = jnp.inf


class Bvh(NamedTuple):
    """Flat DFS BVH (native/bvh_builder.cpp layout)."""

    bmin: Array  # (M,3)
    bmax: Array  # (M,3)
    prim: Array  # (M,)  leaf: primitive row; inner: -1
    skip: Array  # (M,)  next node when bbox i misses


def empty_bvh() -> Bvh:
    z3 = jnp.zeros((0, 3), jnp.float32)
    z = jnp.zeros((0,), jnp.int32)
    return Bvh(z3, z3, z, z)


def traverse(bvh: Bvh, o: Array, d: Array, t_min: float,
             prim_test: Callable[[Array, Array], tuple[Array, Array]]
             ) -> tuple[Array, Array]:
    """Closest hit via skip-link traversal -> (t (B,), prim_idx (B,)).

    prim_test(prim_rows (B,), t_max (B,)) -> (t (B,), hit (B,)) tests one
    primitive row per ray (gather + scalar math inside).
    """
    B = o.shape[0]
    M = bvh.prim.shape[0]
    inv_d = 1.0 / d                                  # (B,3); inf on zeros

    def cond(state):
        cursor, _, _ = state
        return jnp.any(cursor < M)

    def body(state):
        cursor, t_best, best_prim = state
        i = jnp.minimum(cursor, M - 1)
        nb_min = bvh.bmin[i]                          # (B,3)
        nb_max = bvh.bmax[i]

        # Slab test against (t_min, t_best) (aabb.rs:23-48 semantics).
        t0 = (nb_min - o) * inv_d
        t1 = (nb_max - o) * inv_d
        near = jnp.minimum(t0, t1)
        far = jnp.maximum(t0, t1)
        enter = jnp.maximum(jnp.max(near, axis=-1), t_min)
        exit_ = jnp.minimum(jnp.min(far, axis=-1), t_best)
        box_hit = enter < exit_

        prim_rows = bvh.prim[i]                       # (B,)
        is_leaf = prim_rows >= 0
        t_p, p_hit = prim_test(jnp.maximum(prim_rows, 0), t_best)
        take = box_hit & is_leaf & p_hit & (t_p < t_best)
        t_best = jnp.where(take, t_p, t_best)
        best_prim = jnp.where(take, prim_rows, best_prim)

        nxt = jnp.where(box_hit, cursor + 1, bvh.skip[i])
        cursor = jnp.where(cursor < M, nxt, cursor)
        return cursor, t_best, best_prim

    cursor0 = jnp.zeros((B,), jnp.int32)
    t0 = jnp.full((B,), _INF)
    prim0 = jnp.zeros((B,), jnp.int32)
    cursor, t_best, best_prim = jax.lax.while_loop(
        cond, body, (cursor0, t0, prim0))
    return t_best, best_prim


# ---------------------------------------------------------------------------
# Per-family single-primitive tests (the leaf callbacks)
# ---------------------------------------------------------------------------

def sphere_prim_test(sp, o, d, time, t_min):
    """Leaf callback factory for the sphere table (spherical.rs:18-60)."""

    def test(rows: Array, t_max: Array):
        c0 = sp.c0[rows]
        c1 = sp.c1[rows]
        w = ((time - sp.t0[rows]) / (sp.t1[rows] - sp.t0[rows]))[:, None]
        c = c0 + w * (c1 - c0)
        r = sp.radius[rows]
        oc = o - c
        a = jnp.sum(d * d, -1)
        half_b = jnp.sum(oc * d, -1)
        cterm = jnp.sum(oc * oc, -1) - r * r
        disc = half_b * half_b - a * cterm
        ok = disc > 0.0
        sq = jnp.sqrt(jnp.where(ok, disc, 1.0))
        inv_a = 1.0 / a
        root1 = (-half_b - sq) * inv_a
        root2 = (-half_b + sq) * inv_a
        r1_ok = (root1 >= t_min) & (root1 <= t_max)
        root = jnp.where(r1_ok, root1, root2)
        hit = ok & (root >= t_min) & (root <= t_max) & sp.valid[rows]
        return root, hit

    return test


def triangle_prim_test(tr, o, d, t_min):
    """Leaf callback factory for the triangle table (triangular.rs:97-138)."""

    def test(rows: Array, t_max: Array):
        v0 = tr.v0[rows]
        v1 = tr.v1[rows]
        v2 = tr.v2[rows]
        ab = v1 - v0
        ac = v2 - v0
        n = jnp.cross(ab, ac)
        det = -jnp.sum(d * n, -1)
        degen = det == 0.0
        inv_det = 1.0 / jnp.where(degen, 1.0, det)
        ao = o - v0
        aoxd = jnp.cross(ao, d)
        u = jnp.sum(ac * aoxd, -1) * inv_det
        v = -jnp.sum(ab * aoxd, -1) * inv_det
        t = jnp.sum(ao * n, -1) * inv_det
        hit = ((t >= t_min) & (t <= t_max) & (t >= 0.0)
               & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
               & ~degen & tr.valid[rows])
        return t, hit

    return test
