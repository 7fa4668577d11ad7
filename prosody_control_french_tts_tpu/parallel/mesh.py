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


_PRODUCTION_CACHE: dict = {}


def production_data_mesh() -> Mesh | None:
    """The mesh the PRODUCTION measure path shards its corpus batch over
    (core.pipeline / core.batch_runner → prosody.measure: computation
    follows data, the [S, …] batch axis carries P("data")).

    Defaults: all visible devices on an accelerator platform, disabled on
    CPU (virtual CPU meshes are a test fixture — tests opt in). Env
    override ``PCFT_DATA_MESH``: ``0`` disables, ``N`` uses the first N
    devices (any platform). Returns None when only one device would
    participate."""
    import os

    env = os.environ.get("PCFT_DATA_MESH")
    devices = jax.devices()
    key = (env, len(devices), devices[0].platform)
    if key in _PRODUCTION_CACHE:
        return _PRODUCTION_CACHE[key]
    if env is not None:
        try:
            n = min(len(devices), int(env))
        except ValueError:
            raise ValueError(
                f"PCFT_DATA_MESH must be an integer device count (0 disables), got {env!r}"
            ) from None
    else:
        n = len(devices) if devices[0].platform != "cpu" else 1
    mesh = Mesh(np.asarray(devices[:n]), ("data",)) if n > 1 else None
    _PRODUCTION_CACHE[key] = mesh
    return mesh


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
