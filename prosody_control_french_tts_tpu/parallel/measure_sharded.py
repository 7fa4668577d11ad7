"""Sharded prosody measurement: the corpus batch axis over the mesh.

SURVEY.md §7 step 7 (dist + scaling): the measure program's segment axis
is embarrassingly parallel, so multi-chip scaling is pure data
parallelism — place the [S, T] corpora with a ("data",) sharding and jit;
XLA partitions every kernel (FFTs, scans, gathers) along S with no
collectives in the steady state.

The only care point is the associative-scan Viterbi: it vmaps over S, so
partitioning S keeps each chip's scan local. ``measure_sharded`` pads S up
to a multiple of the data-axis size, shards inputs, and runs the same
``_measure_device`` program unchanged — computation follows data.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.pitch import PitchParams
from ..prosody.measure import _measure_device


def pad_batch(arr: np.ndarray, multiple: int) -> np.ndarray:
    S = arr.shape[0]
    Sp = ((S + multiple - 1) // multiple) * multiple
    if Sp == S:
        return arr
    pad = [(0, Sp - S)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def measure_sharded(
    mesh: Mesh,
    nat: np.ndarray,
    nat_len: np.ndarray,
    raw: np.ndarray,
    raw_len: np.ndarray,
    win_nat: np.ndarray,
    win_raw: np.ndarray,
    mask: np.ndarray,
    rate: float,
    pitch_params: PitchParams | None = None,
):
    """Same contract as prosody.measure._measure_device, but with every
    [S, …] input sharded over the mesh's "data" axis. Returns host numpy
    arrays trimmed back to the original S."""
    pp = pitch_params or PitchParams()
    ndata = mesh.shape["data"]
    S = nat.shape[0]
    args = [pad_batch(a, ndata) for a in (nat, nat_len, raw, raw_len, win_nat, win_raw, mask)]
    # padded rows: zero-length signals → all-unvoiced, masked-out windows
    sh = NamedSharding(mesh, P("data"))
    dev_args = [jax.device_put(jnp.asarray(a), sh) for a in args]
    with mesh:
        out = _measure_device(
            *dev_args, rate=float(rate), T=int(args[0].shape[1]), T2=int(args[2].shape[1]), pp=pp
        )
    return tuple(np.asarray(o)[:S] for o in out)
