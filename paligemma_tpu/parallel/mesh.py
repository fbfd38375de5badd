"""Device mesh construction for multi-chip execution.

The reference is single-process single-GPU (SURVEY.md §2.10 — no
torch.distributed anywhere); this module is the TPU-native headroom the
rebuild adds: a ``jax.sharding.Mesh`` over ICI with ``data`` (DP) and
``model`` (TP) axes, consumed by ``paligemma_tpu.parallel.sharding`` and the
pjit-compiled steps. Collectives are inserted by GSPMD from sharding
annotations — no hand-written NCCL/MPI analog.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = 1,
    model: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh.

    ``model=None`` uses all remaining devices on the model axis. The mesh is
    laid out with ``mesh_utils.create_device_mesh`` so the model axis rides
    contiguous ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model is None:
        assert n % data == 0, f"{n} devices not divisible by data={data}"
        model = n // data
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    try:
        device_array = mesh_utils.create_device_mesh((data, model), devices=devices)
    except Exception:
        device_array = np.asarray(devices).reshape(data, model)
    return Mesh(device_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])
