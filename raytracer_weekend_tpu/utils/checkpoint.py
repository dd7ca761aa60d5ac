"""Tile-keyed render checkpoint/resume.

The reference's only resilience is per-frame PNG writes and a pixel stream a
receiver can rebuild from (SURVEY.md §5.3-5.4). The TPU rebuild makes render
work idempotent per tile: a `TileStore` persists each finished
(frame, tile, spp-batch) block of accumulated color sums; `render_resumable`
renders only the tiles missing from the store, so a killed job — or a
dropped host in a multi-host run — resumes where it stopped.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp


class TileStore:
    """Directory of .npy tiles keyed (frame, tile_index)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, frame: int, tile: int) -> str:
        return os.path.join(self.root, f"f{frame:04d}_t{tile:05d}.npy")

    def has(self, frame: int, tile: int) -> bool:
        return os.path.exists(self._path(frame, tile))

    def put(self, frame: int, tile: int, sums: np.ndarray) -> None:
        # .npy suffix on the temp name: np.save appends it otherwise.
        tmp = self._path(frame, tile) + ".tmp.npy"
        np.save(tmp, np.asarray(sums, np.float32))
        os.replace(tmp, self._path(frame, tile))  # atomic: crash-safe

    def get(self, frame: int, tile: int) -> np.ndarray:
        return np.load(self._path(frame, tile))

    def write_meta(self, **meta) -> None:
        with open(os.path.join(self.root, "meta.json"), "w") as f:
            json.dump(meta, f)

    def read_meta(self) -> dict:
        path = os.path.join(self.root, "meta.json")
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)


def render_resumable(scene, static, cfg, cam, store: TileStore,
                     frame: int = 0, tile_pixels: int = 4096,
                     progress=None) -> np.ndarray:
    """Render a frame tile-by-tile, skipping tiles already in the store.

    Returns the (H, W, 3) accumulated color sums. Safe to re-run after a
    crash; also safe to run concurrently from multiple processes as long as
    they partition tiles (writes are atomic).
    """
    from raytracer_weekend_tpu import integrator

    meta = store.read_meta()
    key = dict(width=cfg.width, height=cfg.height,
               spp=cfg.samples_per_pixel, max_depth=cfg.max_depth,
               seed=cfg.seed)
    if meta and meta != key:
        raise ValueError(
            f"store {store.root} holds a different config {meta} != {key}")
    store.write_meta(**key)

    spp = cfg.samples_per_pixel
    n_pix = cfg.n_pixels
    n_tiles = -(-n_pix // tile_pixels)
    out = np.zeros((n_pix, 3), np.float32)
    seed = jnp.uint32(cfg.seed)

    for tile in range(n_tiles):
        start = tile * tile_pixels
        stop = min(start + tile_pixels, n_pix)
        if store.has(frame, tile):
            out[start:stop] = store.get(frame, tile)
        else:
            lanes = jnp.arange(start * spp, stop * spp, dtype=jnp.int32)
            colors = integrator.render_chunk(scene, static, cfg, cam, lanes,
                                             seed)
            sums = np.asarray(colors).reshape(stop - start, spp, 3).sum(1)
            store.put(frame, tile, sums)
            out[start:stop] = sums
        if progress is not None:
            progress(tile + 1, n_tiles)
    return out.reshape(cfg.height, cfg.width, 3)
