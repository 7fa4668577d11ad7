"""Multi-host / multi-slice initialisation and hybrid meshes.

The reference is single-host by construction (SURVEY.md §2: no
NCCL/MPI/Gloo anywhere); this layer is new. Design per the standard JAX
recipe:

- ``initialize()`` wraps ``jax.distributed.initialize`` (controller-less;
  coordinator address + process count from env or args);
- ``hybrid_mesh(ici_model, ici_data)`` builds a ("dcn", "data", "model")
  mesh with ``mesh_utils.create_hybrid_device_mesh`` so tensor-parallel
  collectives ride ICI within a slice and only data-parallel gradient
  reductions cross DCN;
- per-host data loading: each process feeds only its addressable shard
  (``host_local_batch_slice``).

Single-process environments (tests, the dev VM) skip initialisation and
get a degenerate dcn axis of size 1 — every code path works unchanged.
"""

from __future__ import annotations

import logging
import os

import numpy as np

import jax
from jax.sharding import Mesh

log = logging.getLogger(__name__)


def initialize(coordinator: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> bool:
    """Best-effort jax.distributed.initialize; returns True when running
    multi-process. No-ops (returns False) in single-process environments.

    On the CPU backend (multi-host tests, DCN-only clusters) cross-process
    collectives need a transport — select the gloo implementation before the
    backend initialises (exercised for real by
    tests/test_distributed_multiprocess.py, two OS processes + psum)."""
    num_processes = num_processes or int(os.environ.get("PCFT_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    if jax.config.jax_platforms in ("cpu", None) or os.environ.get("JAX_PLATFORMS") == "cpu":
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # noqa: BLE001 — older jax: single-impl CPU collectives
            pass
    jax.distributed.initialize(
        coordinator_address=coordinator or os.environ.get("PCFT_COORDINATOR", "localhost:1234"),
        num_processes=num_processes,
        process_id=process_id if process_id is not None else int(os.environ.get("PCFT_PROCESS_ID", "0")),
    )
    log.info("jax.distributed: process %d/%d", jax.process_index(), jax.process_count())
    return True


def hybrid_mesh(model: int = 1, data: int | None = None, slices: int | None = None) -> Mesh:
    """("dcn", "data", "model") mesh: the model axis on the fastest (ICI)
    dimension, data within a slice, slices across DCN.

    Slice count: explicit ``slices`` override, else device ``slice_index``
    attributes (TPU multi-slice), else one slice per process (multi-host
    CPU/GPU clusters, where each host's devices only reach the others over
    DCN — the process boundary IS the slice boundary)."""
    devices = jax.devices()
    n = len(devices)
    if slices is not None:
        n_slices = slices
        if n % n_slices:
            raise ValueError(f"{n} devices not divisible into {n_slices} slices")
    else:
        # derive slice count from device attributes when available
        slice_ids = {getattr(d, "slice_index", 0) for d in devices}
        n_slices = max(len(slice_ids), 1)
        # process-count fallback only off-TPU: a single-slice multi-host
        # TPU pod reports slice_index 0 everywhere and its cross-process
        # links ARE ICI — splitting a dcn axis per process there would
        # misplace collectives
        if (
            n_slices == 1
            and devices[0].platform != "tpu"
            and jax.process_count() > 1
            and n % jax.process_count() == 0
        ):
            n_slices = jax.process_count()
    per_slice = n // n_slices
    if data is None:
        data = per_slice // model
    if data * model != per_slice:
        raise ValueError(f"{per_slice} devices per slice ≠ data({data})×model({model})")
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (data, model), (n_slices, 1), devices=devices, allow_split_physical_axes=True
        )
        # hybrid mesh returns [dcn*data, model]; reshape to (dcn, data, model)
        arr = np.asarray(arr).reshape(n_slices, data, model)
    except Exception:  # noqa: BLE001 — CPU meshes etc.
        arr = np.asarray(devices[: n_slices * data * model]).reshape(n_slices, data, model)
    return Mesh(arr, ("dcn", "data", "model"))


def host_local_batch_slice(global_batch: int) -> slice:
    """The row range of the global batch this process should feed
    (per-host data loading: each host materialises only its shard)."""
    p, n = jax.process_index(), jax.process_count()
    per = global_batch // n
    return slice(p * per, (p + 1) * per if p < n - 1 else global_batch)
