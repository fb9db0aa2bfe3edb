"""Data-side helpers: fps time grids, temporal IoU, text joining.

Behavioral equivalents of reference data/utils.py:19-49,115-122, numpy-based.
"""

from __future__ import annotations

import math
import random
from typing import Sequence

import numpy as np


def round_time_by_fps(time: float, fps: float, min_time: float, max_time: float) -> float:
    return min(max(round(time * fps) / fps, min_time), max_time)


def ceil_time_by_fps(time: float, fps: float, min_time: float, max_time: float) -> float:
    return min(max(math.ceil(time * fps) / fps, min_time), max_time)


def floor_time_by_fps(time: float, fps: float, min_time: float, max_time: float) -> float:
    return min(max(math.floor(time * fps) / fps, min_time), max_time)


def rand_bool() -> bool:
    return bool(random.getrandbits(1))


def case_connect(prefix: str, suffix: str) -> str:
    """Join two sentence fragments with capitalization rules
    (reference data/utils.py:22-29)."""
    if not prefix:
        return suffix[0].upper() + suffix[1:]
    if not suffix:
        return prefix
    if prefix[-1] in ",:":
        return prefix + " " + suffix[0].lower() + suffix[1:]
    return prefix + " " + suffix[0].upper() + suffix[1:]


def inverse_preprocess_to_images(frames: np.ndarray, mean: Sequence[float],
                                 std: Sequence[float]) -> np.ndarray:
    """Undo normalization back to uint8 HWC images (reference
    data/utils.py:14-17 returns PIL images; numpy here, PIL-able)."""
    mean = np.asarray(mean, np.float32).reshape(1, -1, 1, 1)
    std = np.asarray(std, np.float32).reshape(1, -1, 1, 1)
    x = frames * std + mean
    x = np.clip(x * 255.0, 0, 255).astype(np.uint8)
    return x.transpose(0, 2, 3, 1)


def temporal_iou(region1: Sequence[float], region2: Sequence[float]) -> float:
    area1 = region1[1] - region1[0]
    area2 = region2[1] - region2[0]
    inter = max(0.0, min(region1[1], region2[1]) - max(region1[0], region2[0]))
    union = area1 + area2 - inter
    return inter / union if union else 0.0


def batch_temporal_iou(seq1: np.ndarray, seq2: np.ndarray) -> np.ndarray:
    """(N, 2) x (M, 2) -> (N, M) IoU matrix."""
    area1 = seq1[:, 1] - seq1[:, 0]
    area2 = seq2[:, 1] - seq2[:, 0]
    l = np.maximum(seq1[:, None, 0], seq2[None, :, 0])
    r = np.minimum(seq1[:, None, 1], seq2[None, :, 1])
    inter = np.clip(r - l, 0, None)
    union = area1[:, None] + area2[None] - inter
    return inter / union
