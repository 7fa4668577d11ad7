"""Split-precision MXU matmuls.

The v5e MXU multiplies bf16 natively; float32 matmuls are emulated by the
compiler at HIGHEST precision with a fixed multi-pass scheme that measures
~6× the bf16 cost. Splitting each float32 operand into bf16 terms by hand
buys back most of that:

- ``mm_split3`` (2-way split, 3 MXU passes): absolute error ≈ κ·2⁻¹⁶ where
  κ = Σ|aᵢbᵢ| / max|Σaᵢbᵢ| is the contraction's cancellation factor. Right
  for well-conditioned contractions (κ ≈ 1, e.g. power-spectrum DFTs).
- ``mm_split6`` (3-way split, 6 passes): error ≈ κ·2⁻²⁴ — float32-grade
  even for oscillatory kernels with κ ~ 100 (e.g. the K-weighting FIR,
  measured 2e-3 under split3 vs 3e-7 under split6), at roughly a third of
  XLA HIGHEST's measured cost for the same shape.

All passes accumulate in float32 on the MXU (preferred_element_type).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dot(x, y):
    return jax.lax.dot(x, y, preferred_element_type=jnp.float32)


def _split2(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split3(a):
    t1 = a.astype(jnp.bfloat16)
    r = a - t1.astype(jnp.float32)
    t2 = r.astype(jnp.bfloat16)
    t3 = (r - t2.astype(jnp.float32)).astype(jnp.bfloat16)
    return t1, t2, t3


def mm_split3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[M,K]·[K,N] float32 matmul as 3 bf16 MXU passes (~16 mantissa bits)."""
    ah, al = _split2(a)
    bh, bl = _split2(b)
    return _dot(ah, bh) + (_dot(ah, bl) + _dot(al, bh))


def mm_split6(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[M,K]·[K,N] float32 matmul as 6 bf16 MXU passes (~24 mantissa bits,
    i.e. float32-grade; the same term set XLA's HIGHEST emulation keeps:
    products whose combined magnitude exceeds 2⁻²⁴)."""
    a1, a2, a3 = _split3(a)
    b1, b2, b3 = _split3(b)
    low = _dot(a1, b3) + _dot(a2, b2) + _dot(a3, b1)
    mid = _dot(a1, b2) + _dot(a2, b1)
    return (low + mid) + _dot(a1, b1)
