"""Dynamic time warping on TPU (lax.scan over anti-diagonal-free rows).

Used by the evaluation suite for DTW-aligned log-F0 RMSE — the reference
computes this with ``fastdtw`` on host
(Code/Pipeline/evaluate_voice.ipynb, ``compute_f0_rmse``).

``dtw_distance`` is fully jittable (O(N·M) cells via a row scan).
``dtw_path`` additionally returns the warping path (host backtrack over the
device-computed cost matrix) for aligned-error metrics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_INF = jnp.float32(1e30)


@partial(jax.jit, static_argnames=())
def _cost_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Accumulated-cost matrix D [N, M] with |a_i − b_j| local cost and
    steps {(1,0),(0,1),(1,1)}."""
    local = jnp.abs(a[:, None] - b[None, :])  # [N, M]

    def row_step(prev_row, cur_local):
        # prev_row: D[i-1, :]; compute D[i, :] left-to-right via scan
        def cell(carry, inp):
            left = carry
            up, diag, lc = inp
            best = jnp.minimum(jnp.minimum(left, up), diag)
            val = lc + best
            return val, val

        diag_row = jnp.concatenate([jnp.array([_INF]), prev_row[:-1]])
        # first cell's "diag" for j=0 is D[i-1, -1]→INF except handled by init
        _, row = jax.lax.scan(cell, _INF, (prev_row, diag_row, cur_local))
        return row, row

    # first row: cumulative sum of local costs
    first = jnp.cumsum(local[0])
    _, rest = jax.lax.scan(row_step, first, local[1:])
    return jnp.concatenate([first[None, :], rest], axis=0)


def dtw_distance(a, b) -> float:
    """Total DTW distance between two 1-D sequences."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    D = _cost_matrix(a, b)
    return float(D[-1, -1])


def dtw_path(a, b) -> tuple[float, list[tuple[int, int]]]:
    """(distance, path) — path as (i, j) index pairs, fastdtw-style."""
    a_j = jnp.asarray(a, jnp.float32)
    b_j = jnp.asarray(b, jnp.float32)
    D = np.asarray(_cost_matrix(a_j, b_j))
    i, j = D.shape[0] - 1, D.shape[1] - 1
    path = [(i, j)]
    while i > 0 or j > 0:
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            moves = [(D[i - 1, j - 1], i - 1, j - 1), (D[i - 1, j], i - 1, j), (D[i, j - 1], i, j - 1)]
            _, i, j = min(moves)
        path.append((i, j))
    path.reverse()
    return float(D[-1, -1]), path
