"""O(1) range-maximum queries over long signals (sparse table on chunks).

Needed for the reference's peak-normalise-before-metering: every syntagme
slice is divided by its own absolute peak before loudness gating
(Code/audioPipeline.py:348-350). A naive masked max over [windows × T]
explodes; instead:

- chunk maxima [n_chunks] (CHUNK=1024 samples),
- log₂-level sparse table M[k][i] = max of chunks [i, i+2^k),
- a window's interior chunk-max is two gathers,
- the ≤CHUNK-sample partial edges decompose radix-SUB (SUB=32): a
  fixed-width-SUB gather over precomputed SUB-sample maxima plus two
  fixed-width-SUB raw-sample gathers.

Total precompute O(T log(T/CHUNK)) elementwise max — VPU-friendly. The
radix edge decomposition matters on TPU: arbitrary-index gathers from a
[S, T] HBM signal are the expensive primitive (a 1024-wide edge gather
measured 15.2 ms of the 26.5 ms query at the corpus shape on v5e; the
3×SUB-wide form reads 10× fewer elements for identical results).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

CHUNK = 1024
SUB = 32  # radix for edge decomposition; CHUNK == SUB * SUB


@jax.tree_util.register_pytree_node_class
@dataclass
class RangeMax:
    levels: jnp.ndarray  # [..., K, NC] sparse table over chunk maxima
    sub: jnp.ndarray  # [..., NC*SUB] SUB-sample maxima (edge interiors)
    signal: jnp.ndarray  # [..., T] original |x| (for edge gathers)
    length: int

    def tree_flatten(self):
        return (self.levels, self.sub, self.signal), (self.length,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, length=aux[0])

    @classmethod
    def build(cls, x: jnp.ndarray) -> "RangeMax":
        ax = jnp.abs(x.astype(jnp.float32))
        T = ax.shape[-1]
        nc = -(-T // CHUNK)
        pad = [(0, 0)] * (ax.ndim - 1) + [(0, nc * CHUNK - T)]
        xp = jnp.pad(ax, pad, constant_values=0.0)
        sub_max = xp.reshape(ax.shape[:-1] + (nc * SUB, SUB)).max(axis=-1)  # [..., NC*SUB]
        chunk_max = sub_max.reshape(ax.shape[:-1] + (nc, SUB)).max(axis=-1)  # [..., NC]
        levels = [chunk_max]
        k = 1
        while (1 << k) <= nc:
            prev = levels[-1]
            span = 1 << (k - 1)
            nxt = jnp.maximum(prev, jnp.roll(prev, -span, axis=-1))
            levels.append(nxt)
            k += 1
        return cls(levels=jnp.stack(levels, axis=-2), sub=sub_max, signal=ax, length=T)

    def _chunk_range_max(self, ca: jnp.ndarray, cb: jnp.ndarray) -> jnp.ndarray:
        """Max over chunks [ca, cb); 0 where empty."""
        n = cb - ca
        nc = self.levels.shape[-1]
        k = jnp.clip(jnp.floor(jnp.log2(jnp.maximum(n, 1).astype(jnp.float32))).astype(jnp.int32), 0, self.levels.shape[-2] - 1)
        span = 1 << k
        i2 = jnp.clip(cb - span, 0, nc - 1)
        i1 = jnp.clip(ca, 0, nc - 1)
        bdims = self.levels.ndim - 2

        def take2(idx_k, idx_i):
            flat = self.levels.reshape(self.levels.shape[:-2] + (-1,))
            lin = idx_k * nc + idx_i
            if bdims == 0:
                return jnp.take(flat, lin)
            return jnp.take_along_axis(
                flat, lin.reshape(lin.shape[:bdims] + (-1,)), axis=-1
            ).reshape(lin.shape)

        m = jnp.maximum(take2(k, i1), take2(k, i2))
        return jnp.where(n > 0, m, 0.0)

    def _masked_take(self, arr: jnp.ndarray, base: jnp.ndarray, stop: jnp.ndarray) -> jnp.ndarray:
        """max arr[base : stop] for stop-base ≤ SUB, via one width-SUB gather."""
        n = arr.shape[-1]
        offs = jnp.arange(SUB)
        pos = base[..., None] + offs
        idx = jnp.clip(pos, 0, n - 1)
        bdims = arr.ndim - 1
        if bdims == 0:
            vals = jnp.take(arr, idx)
        else:
            vals = jnp.take_along_axis(
                arr, idx.reshape(idx.shape[:bdims] + (-1,)), axis=-1
            ).reshape(idx.shape)
        return jnp.max(jnp.where(pos < stop[..., None], vals, 0.0), axis=-1)

    def _edge_max(self, start: jnp.ndarray, stop: jnp.ndarray) -> jnp.ndarray:
        """Max over ≤CHUNK samples [start, stop), radix-SUB: full SUB-blocks
        from the precomputed sub maxima, ragged ends from the signal."""
        T = self.signal.shape[-1]
        start = jnp.clip(start, 0, T)
        stop = jnp.clip(stop, start, T)
        sa = -(-start // SUB)  # first fully covered sub-block
        sb = stop // SUB  # last fully covered sub-block (exclusive)
        interior = self._masked_take(self.sub, jnp.minimum(sa, sb), sb)
        left = self._masked_take(self.signal, start, jnp.minimum(sa * SUB, stop))
        right = self._masked_take(self.signal, jnp.maximum(sb * SUB, start), stop)
        return jnp.maximum(interior, jnp.maximum(left, right))

    def query(self, lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
        """max |x[lo:hi]| for index arrays broadcast against batch dims;
        0.0 for empty windows."""
        lo = jnp.clip(lo, 0, self.length)
        hi = jnp.clip(hi, lo, self.length)
        ca = -(-lo // CHUNK)  # first fully covered chunk
        cb = hi // CHUNK  # last fully covered chunk (exclusive)
        interior = self._chunk_range_max(jnp.minimum(ca, cb), cb)
        left = self._edge_max(lo, jnp.minimum(ca * CHUNK, hi))
        right = self._edge_max(jnp.maximum(cb * CHUNK, lo), hi)
        return jnp.maximum(interior, jnp.maximum(left, right))
