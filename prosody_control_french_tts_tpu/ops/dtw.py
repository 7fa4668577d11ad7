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


@jax.jit
def monotonic_partition_costs(cost: jnp.ndarray) -> jnp.ndarray:
    """Accumulated-cost matrix for the token↔frame monotonic-partition DP
    used by whisper-timestamped-style cross-attention alignment
    (align.whisper_jax.token_times_from_cross_attention): steps (1,1) and
    (0,1), so every token owns a contiguous, non-empty frame span.

    cost: [L, F] local costs → D [L+1, F+1] float32 with
    D[0, :] = 0, D[i, 0] = INF (i ≥ 1),
    D[i, j] = cost[i-1, j-1] + min(D[i-1, j-1], D[i, j-1]).

    TPU formulation: the in-row recurrence R[j] = c[j] + min(P[j-1], R[j-1])
    unrolls to R = S + cummin(P[:-1] − S₋₁) with S the row prefix-sum —
    an associative scan (O(log F) depth) per row instead of an O(F)
    sequential carry; rows advance under one lax.scan. Replaces the
    reference-shaped O(L·F) Python double loop (the whisper-timestamped
    technique runs this DP on host in torch/numpy).

    Rows are computed top-down, so D[:n+1] is exactly the DP of cost[:n] —
    callers may pad L to a bucket and slice the prefix they need.
    """
    F = cost.shape[1]
    inf = jnp.float32(1e30)

    def row_step(prev, c):
        s = jnp.cumsum(c)
        shifted = jnp.concatenate([jnp.zeros((1,), s.dtype), s[:-1]])
        best_entry = jax.lax.associative_scan(jnp.minimum, prev[:-1] - shifted)
        row = jnp.concatenate([jnp.full((1,), inf), s + best_entry])
        return row, row

    first = jnp.zeros((F + 1,), jnp.float32)
    _, rows = jax.lax.scan(row_step, first, cost.astype(jnp.float32))
    return jnp.concatenate([first[None, :], rows], axis=0)


monotonic_partition_costs_batched = jax.jit(jax.vmap(monotonic_partition_costs))
"""[B, L, F] local costs → [B, L+1, F+1] DP matrices in ONE launch — the
batched-alignment path (align_batch) amortizes the per-launch tunnel floor
across every segment's cross-attention DTW."""


def monotonic_partition_backtrack(D: np.ndarray) -> np.ndarray:
    """Host backtrack (O(L+F)) over a ``monotonic_partition_costs`` prefix:
    → [L, 2] frame spans (start, end). Tie rule: diagonal wins, matching
    the fill order (choice = D[i-1, j-1] <= D[i, j-1])."""
    n_tok = D.shape[0] - 1
    spans = np.zeros((n_tok, 2))
    i, j = n_tok, D.shape[1] - 1
    end_j = j
    while i > 0 and j > 0:
        if D[i - 1, j - 1] <= D[i, j - 1]:
            spans[i - 1] = (j - 1, end_j)
            i -= 1
            end_j = j - 1
        j -= 1
    return spans


@jax.jit
def monotonic_partition_spans_batched(
    cost: jnp.ndarray, n_tok: jnp.ndarray, n_fr: jnp.ndarray
) -> jnp.ndarray:
    """Fully on-device batched partition alignment: [B, L, F] local costs
    (+ per-item REAL sizes n_tok [B], n_fr [B]) → spans [B, L, 2] float32
    frame indices, rows ≥ n_tok[b] zero.

    Equivalent to ``monotonic_partition_backtrack(D[b, :n_tok[b]+1,
    :n_fr[b]+1])`` per item (same ``<=`` tie rule), but the backtrack runs
    as a fixed-length device scan instead of a host loop over the pulled
    D matrix — on remote runtimes the [B, L+1, F+1] float32 readback is
    the dominant cost of alignment (MBs over a ~40 MB/s link for KBs of
    actual result). Pad rows/columns beyond the real sizes never influence
    real spans (the DP's prefix property; the walk starts at
    (n_tok[b], n_fr[b]) and each step decrements j, so it never touches
    j > n_fr[b])."""
    D = jax.vmap(monotonic_partition_costs)(cost)  # [B, L+1, F+1]
    L, F = cost.shape[1], cost.shape[2]

    def one(Di, nt, nf):
        def step(state, t):
            i, end_j, spans = state
            j = nf - t
            take = (i > 0) & (j > 0) & (Di[i - 1, j - 1] <= Di[i, j - 1])
            # scatter row i-1 when the path enters it; index L drops the write
            row = jnp.where(take, i - 1, L)
            spans = spans.at[row].set(
                jnp.stack([(j - 1).astype(jnp.float32), end_j.astype(jnp.float32)]),
                mode="drop",
            )
            i = i - take.astype(i.dtype)
            end_j = jnp.where(take, j - 1, end_j)
            return (i, end_j, spans), None

        init = (nt.astype(jnp.int32), nf.astype(jnp.int32), jnp.zeros((L, 2), jnp.float32))
        (_, _, spans), _ = jax.lax.scan(step, init, jnp.arange(F, dtype=jnp.int32))
        return spans

    return jax.vmap(one)(D, n_tok, n_fr)


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
