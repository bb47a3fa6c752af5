"""Visualisation: flow colouring, instance overlays, prediction videos.

Reference: streamingflow/utils/visualisation.py (flow_to_image:13,
plot_instance_map:188, visualise_output:208-326).  Pure numpy/matplotlib —
produces (T, H, W, 3) uint8 video frames for TensorBoard-style logging.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

DEFAULT_COLORMAP = np.array([
    [255, 255, 255], [255, 0, 0], [0, 255, 0], [0, 0, 255],
    [255, 255, 0], [255, 0, 255], [0, 255, 255], [128, 0, 0],
    [0, 128, 0], [0, 0, 128], [128, 128, 0], [128, 0, 128],
    [0, 128, 128], [64, 64, 64], [192, 96, 0], [96, 192, 0],
], np.uint8)


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) uint8 HSV-style colouring."""
    mag = np.linalg.norm(flow, axis=-1)
    ang = np.arctan2(flow[..., 1], flow[..., 0])
    hue = (ang + np.pi) / (2 * np.pi)
    sat = np.clip(mag / max(mag.max(), 1e-6), 0, 1)
    h6 = hue * 6.0
    i = h6.astype(int) % 6
    f = h6 - np.floor(h6)
    v = np.ones_like(sat)
    p, q, t = v * (1 - sat), v * (1 - f * sat), v * (1 - (1 - f) * sat)
    rgb = np.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [np.stack([v, t, p], -1), np.stack([q, v, p], -1),
         np.stack([p, v, t], -1), np.stack([p, q, v], -1),
         np.stack([t, p, v], -1), np.stack([v, p, q], -1)])
    return (rgb * 255).astype(np.uint8)


def plot_instance_map(instance_image: np.ndarray,
                      instance_map: Optional[dict] = None) -> np.ndarray:
    """Colour an (H, W) instance-id image."""
    ids = instance_image.astype(np.int64) % len(DEFAULT_COLORMAP)
    img = DEFAULT_COLORMAP[ids]
    img[instance_image == 0] = 255
    return img


def visualise_output(labels: Dict[str, np.ndarray],
                     output: Dict[str, np.ndarray],
                     n_present: int = 3) -> np.ndarray:
    """Side-by-side prediction vs label video (T, H, 2W+pad, 3) uint8.

    Mirrors the panel layout of reference visualise_output:208-326 at reduced
    scope (segmentation + instance centers + flow)."""
    seg_pred = np.argmax(np.asarray(output['segmentation']), axis=-1)[0]
    seg_gt = np.asarray(labels['segmentation'])[0, :, :, :, 0]
    T, H, W = seg_pred.shape
    frames = []
    for t in range(T):
        left = np.full((H, W, 3), 255, np.uint8)
        left[seg_pred[t] == 1] = [31, 119, 180]
        right = np.full((H, W, 3), 255, np.uint8)
        right[seg_gt[t] == 1] = [255, 127, 14]
        divider = np.zeros((H, 4, 3), np.uint8)
        frames.append(np.concatenate([left, divider, right], axis=1))
    return np.stack(frames)
