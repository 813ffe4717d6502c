"""Device mesh helpers.

The reference is single-GPU (SURVEY.md §2.3); distribution is a new,
TPU-native subsystem: a 1-D (or 2-D) logical mesh over the pod slice, with
the tile grid row-partitioned along the "row" axis and x exchanged via
collectives (BASELINE.md configs 4-5).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


ROW_AXIS = "row"


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = (ROW_AXIS,)) -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    if len(axis_names) == 1:
        return Mesh(np.array(devs[:n]), axis_names)
    raise NotImplementedError("2-D meshes arrive with block partitioning")
