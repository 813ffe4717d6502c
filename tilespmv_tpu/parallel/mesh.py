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
COL_AXIS = "col"


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = (ROW_AXIS,)) -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    if len(axis_names) == 1:
        return Mesh(np.array(devs[:n]), axis_names)
    raise ValueError("make_mesh is 1-D; use make_mesh2d")


def make_mesh2d(rows: int, cols: int,
                axis_names: Sequence[str] = (ROW_AXIS, COL_AXIS)) -> Mesh:
    """2-D (rows x cols) mesh for block-partitioned SpMV."""
    devs = jax.devices()
    if rows * cols > len(devs):
        raise ValueError(
            f"requested {rows}x{cols} devices, have {len(devs)}")
    grid = np.array(devs[: rows * cols]).reshape(rows, cols)
    return Mesh(grid, axis_names)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Bring up the multi-host JAX runtime (DCN) before building meshes.

    Thin wrapper over `jax.distributed.initialize` (args default to the
    TPU pod metadata on Cloud TPU). After this, `jax.devices()` spans the
    pod slice and `make_mesh`/`make_mesh2d` lay blocks across hosts; the
    same SPMD programs run unchanged — collectives ride ICI within a host
    and DCN across hosts (BASELINE.md config 5).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
