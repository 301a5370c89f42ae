"""Visualization writers (debug outputs, reference ShowDepthMap /
ShowNormalMap / ShowWeakImage / ShowEdgeImage, APD.cpp:694-840)."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..config import PixelState


def _save(path, rgb: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(rgb.astype(np.uint8)).save(str(path))


def depth_color(depth: np.ndarray, dmin: float, dmax: float) -> np.ndarray:
    """Jet-style colormap; invalid (<=0) pixels black."""
    t = np.clip((depth - dmin) / max(dmax - dmin, 1e-12), 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * t - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * t - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * t - 1), 0, 1)
    rgb = np.stack([r, g, b], -1) * 255.0
    rgb[depth <= 0] = 0
    return rgb


def write_depth_viz(path, depth, dmin, dmax):
    _save(path, depth_color(np.asarray(depth), float(dmin), float(dmax)))


def write_normal_viz(path, normal_world):
    n = np.asarray(normal_world)
    rgb = np.clip((n + 1.0) * 0.5 * 255.0, 0, 255)
    _save(path, rgb)


def write_weak_viz(path, weak):
    """STRONG white, WEAK green, UNKNOWN red."""
    w = np.asarray(weak)
    rgb = np.zeros((*w.shape, 3), np.uint8)
    rgb[w == PixelState.STRONG] = (255, 255, 255)
    rgb[w == PixelState.WEAK] = (0, 255, 0)
    rgb[w == PixelState.UNKNOWN] = (255, 0, 0)
    _save(path, rgb)


def write_edge_viz(path, edge):
    e = (np.asarray(edge) > 0).astype(np.uint8) * 255
    _save(path, np.stack([e, e, e], -1))
