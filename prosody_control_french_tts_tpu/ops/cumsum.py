"""Two-level (chunked) cumulative sums.

``jnp.cumsum`` over a ~10⁶-sample axis takes tens of seconds to *compile*
on XLA:CPU (the associative-scan expansion blows up), while the same prefix
sums split into [n_chunks, chunk] compile in <1 s and run fast on both CPU
and TPU (better VPU tiling, no giant scan). Every windowed reduction in this
framework (LUFS gating blocks, RMS windows, syntagme energies) goes through
this structure: build once per signal, then any [a, b) sum is two gathers.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

# 2048, NOT 1024: this jax/libtpu's cumsum lowering has a pathological
# slow path exactly at minor-axis width 1024 (measured 12 ms for a
# [10, 1017, 1024] in-chunk cumsum vs 0.3-0.7 ms at widths 512/2048/4096)
CHUNK = 2048


@jax.tree_util.register_pytree_node_class
@dataclass
class ChunkedCumsum:
    """Exclusive prefix sums of a [..., T] signal, queryable at any index
    0 ≤ i ≤ T (``lookup(i)`` = sum(x[..., :i]); out-of-range clamps)."""

    within_ex: jnp.ndarray  # [..., n_chunks, CHUNK] exclusive in-chunk sums
    block: jnp.ndarray  # [..., n_chunks] exclusive chunk-total prefix
    chunk_tot: jnp.ndarray  # [..., n_chunks] raw chunk totals (local magnitude)
    length: int  # original T (static)

    def tree_flatten(self):
        return (self.within_ex, self.block, self.chunk_tot), (self.length,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, length=aux[0])

    @classmethod
    def build(cls, x: jnp.ndarray) -> "ChunkedCumsum":
        T = x.shape[-1]
        nb = T // CHUNK + 1  # ≥ 1 padded slot → nb·CHUNK ≥ T+1, lookup(T) safe
        pad = [(0, 0)] * (x.ndim - 1) + [(0, nb * CHUNK - T)]
        xp = jnp.pad(x, pad).reshape(x.shape[:-1] + (nb, CHUNK))
        within = jnp.cumsum(xp, axis=-1)
        chunk_tot = within[..., -1]
        block = jnp.cumsum(chunk_tot, axis=-1) - chunk_tot  # exclusive
        return cls(within_ex=within - xp, block=block, chunk_tot=chunk_tot, length=T)

    def lookup(self, idx: jnp.ndarray) -> jnp.ndarray:
        """Prefix sum at integer indices idx [..., *I] (broadcast against the
        signal's batch dims)."""
        idx = jnp.clip(idx, 0, self.length)
        q = idx // CHUNK
        r = idx % CHUNK
        flat_w = self.within_ex.reshape(self.within_ex.shape[:-2] + (-1,))
        bdims = self.block.ndim - 1
        if bdims == 0:
            b = jnp.take(self.block, q)
            w = jnp.take(flat_w, q * CHUNK + r)
        else:
            qf = q.reshape(q.shape[:bdims] + (-1,))
            wf = (q * CHUNK + r).reshape(q.shape[:bdims] + (-1,))
            b = jnp.take_along_axis(self.block, qf, axis=-1).reshape(q.shape)
            w = jnp.take_along_axis(flat_w, wf, axis=-1).reshape(q.shape)
        return b + w

    def range_sum(self, lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
        return self.lookup(hi) - self.lookup(lo)

    def range_sum_local(self, lo: jnp.ndarray, hi: jnp.ndarray, max_span: int) -> jnp.ndarray:
        """``range_sum`` for windows of bounded width (hi − lo ≤ max_span
        samples) WITHOUT differencing the global chunk-total prefix: the
        float32 prefix grows with file position, so for hour-scale signals
        ``lookup(hi) − lookup(lo)`` carries the prefix's absolute rounding
        (~0.1+ at 1 h of speech power) into a window sum of order 1. Here
        the between-chunk part is a masked sum of the ≤⌈max_span/CHUNK⌉+1
        raw chunk totals inside the window — every term is window-sized, so
        the error is window-relative regardless of position."""
        lo = jnp.clip(lo, 0, self.length)
        hi = jnp.clip(hi, 0, self.length)
        q1, r1 = lo // CHUNK, lo % CHUNK
        q2, r2 = hi // CHUNK, hi % CHUNK
        K = max_span // CHUNK + 1
        tot = self.chunk_tot  # [..., n_chunks] raw (window-magnitude) totals
        nb = tot.shape[-1]
        idx = jnp.clip(q1[..., None] + jnp.arange(K), 0, nb - 1)  # [..., K]
        bdims = tot.ndim - 1
        if bdims == 0:
            mid = jnp.where(
                (q1[..., None] + jnp.arange(K)) < q2[..., None], jnp.take(tot, idx), 0.0
            ).sum(-1)
        else:
            flat = idx.reshape(idx.shape[:bdims] + (-1,))
            g = jnp.take_along_axis(tot, flat, axis=-1).reshape(idx.shape)
            mid = jnp.where((q1[..., None] + jnp.arange(K)) < q2[..., None], g, 0.0).sum(-1)
        w1 = self._within_at(q1, r1)
        w2 = self._within_at(q2, r2)
        # sum over [lo, hi) = full chunks q1..q2-1, minus the [q1*C, lo) head,
        # plus the [q2*C, hi) tail
        return mid - w1 + w2

    def _within_at(self, q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
        flat_w = self.within_ex.reshape(self.within_ex.shape[:-2] + (-1,))
        bdims = self.block.ndim - 1
        if bdims == 0:
            return jnp.take(flat_w, q * CHUNK + r)
        wf = (q * CHUNK + r).reshape(q.shape[:bdims] + (-1,))
        return jnp.take_along_axis(flat_w, wf, axis=-1).reshape(q.shape)

    @property
    def total(self) -> jnp.ndarray:
        return self.block[..., -1] + self.within_ex[..., -1, -1]


def chunked_cumsum_sq(x: jnp.ndarray) -> ChunkedCumsum:
    """ChunkedCumsum of x² — the common case (energy windows)."""
    return ChunkedCumsum.build(jnp.square(x.astype(jnp.float32)))
