"""Mesh construction and basic sharding helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    """("data", "model") mesh. On a v5e slice the model axis should map to
    the minor (fast-ICI) dimension — jax's default device order does this
    for contiguous slices."""
    devices = list(devices if devices is not None else jax.devices())
    need = data * model
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def local_mesh(model_parallel: int | None = None) -> Mesh:
    """Best-effort mesh over all local devices: model axis = given (or the
    largest power of two ≤ 4 dividing the device count), data = rest."""
    n = len(jax.devices())
    if model_parallel is None:
        model_parallel = 1
        for cand in (4, 2):
            if n % cand == 0 and n >= cand:
                model_parallel = cand
                break
    return make_mesh(n // model_parallel, model_parallel)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
