"""Tone mapping and PNG output.

Reproduces the reference's writeback exactly (console_app/src/main.rs:78-87):
divide the accumulated color sum by spp, gamma-correct with sqrt (gamma 2.0),
clamp to [0, 0.999], scale by 255.999, truncate to u8.
"""

from __future__ import annotations

import numpy as np


def tone_map(color_sum: np.ndarray, samples_per_pixel: int) -> np.ndarray:
    """(H,W,3) accumulated color sums -> (H,W,3) uint8."""
    c = np.asarray(color_sum, np.float32) / float(samples_per_pixel)
    c = np.sqrt(np.maximum(c, 0.0))
    c = np.clip(c, 0.0, 0.999)
    return (255.999 * c).astype(np.uint8)


def save_png(path: str, rgb_u8: np.ndarray) -> None:
    # Write-then-rename so a live-reloading viewer (live_view rewrites the
    # PNG in place while tailing a render) never reads a half-written file.
    import os
    from PIL import Image

    tmp = f"{path}.tmp-{os.getpid()}"
    Image.fromarray(np.asarray(rgb_u8, np.uint8), "RGB").save(tmp,
                                                             format="PNG")
    os.replace(tmp, path)


def tone_map_f32(color_sum: np.ndarray, samples_per_pixel: int) -> np.ndarray:
    """Float variant (no quantization) for allclose comparisons in tests."""
    c = np.asarray(color_sum, np.float32) / float(samples_per_pixel)
    return np.clip(np.sqrt(np.maximum(c, 0.0)), 0.0, 0.999)
