"""Split-precision MXU matmuls.

The v5e MXU multiplies bf16 natively. On this toolchain a DEFAULT-precision
float32 ``dot`` runs as ONE bf16 pass (measured 205 TFLOP/s ≈ datasheet
peak, relative error ~2e-3), and ``Precision.HIGHEST`` emulates float32
with a 6-pass scheme (measured 30 TFLOP/s, ~1.2e-7). Splitting each
float32 operand into bf16 terms by hand recovers the middle ground:

- ``mm_split3`` (2-way split, 3 MXU passes): error ≈ κ·2⁻¹⁶ where
  κ = Σ|aᵢbᵢ| / max|Σaᵢbᵢ| is the contraction's cancellation factor
  (measured 1.3e-5 on random 1024² @ κ≈1, 64 TFLOP/s — 2.1× HIGHEST's
  throughput). Right for well-conditioned contractions (κ ≈ 1, e.g.
  power-spectrum DFTs).
- ``mm_split6`` (3-way split, 6 passes): error ≈ κ·2⁻²⁴ — float32-grade
  even for oscillatory kernels with κ ~ 100 (e.g. the K-weighting FIR).
  Measured 1.6e-7 at 31 TFLOP/s: on THIS toolchain that matches HIGHEST's
  cost, so its value is portability of the error bound, not speed — keep
  it for κ-sensitive kernels, and prefer ``mm_split3`` wherever κ ≈ 1.

HARDWARE PITFALL (the reason for the bit-mask split): writing the split as
``hi = a.astype(bf16); lo = (a - hi.astype(f32)).astype(bf16)`` compiles
correctly on CPU but on the real TPU XLA folds the f32→bf16→f32 round trip
to identity (excess-precision simplification), so ``a - hi`` cancels to
EXACTLY ZERO and every "split" matmul silently degrades to one bf16 pass
(measured: split3 == split6 == 2.1e-3 == single-pass error, with the low
terms all-zero on device). ``optimization_barrier`` on the converted
values also defeats the fold, but the mask needs no barrier and keeps the
graph fusible: truncating the low 16 mantissa bits via integer bitmask is
opaque to the algebraic simplifier, the residual ``a - hi`` is exact in
float32 (aligned exponents), and ``hi``'s bf16 conversion is lossless by
construction. Truncation (round-toward-zero) costs one bit vs
round-to-nearest — measured 1.3e-5 vs 4.9e-6 for split3 — which the term
budget absorbs. tests/test_ops_dsp.py::TestSplitPrecision pins the
nonzero-residual contract so a compiler regression cannot silently
reintroduce the fold.

All passes accumulate in float32 on the MXU (preferred_element_type).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _dot(x, y):
    return jax.lax.dot(x, y, preferred_element_type=jnp.float32)


def _mask_hi(a):
    """Top-16-bit truncation of float32 (exactly representable in bf16)."""
    u = jax.lax.bitcast_convert_type(a, jnp.uint32)
    return jax.lax.bitcast_convert_type(u & np.uint32(0xFFFF0000), jnp.float32)


def _split2(a):
    hi = _mask_hi(a)
    return hi.astype(jnp.bfloat16), (a - hi).astype(jnp.bfloat16)


def _split3(a):
    h1 = _mask_hi(a)
    r1 = a - h1
    h2 = _mask_hi(r1)
    r2 = r1 - h2
    return h1.astype(jnp.bfloat16), h2.astype(jnp.bfloat16), r2.astype(jnp.bfloat16)


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
