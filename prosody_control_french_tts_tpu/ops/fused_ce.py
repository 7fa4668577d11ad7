"""Fused LM-head + cross-entropy: logits never reach HBM.

The standard causal-LM loss materializes [tokens, vocab] f32 logits
(537 MB at the train-bench shape: 4096 tokens × 32k vocab), reads them
for the logsumexp, and in the backward materializes d-logits of the
same size for the head's dx matmul — ~2–3 GB of HBM traffic per step
for tensors that are pure intermediates. The reference pays the same
cost inside HF Trainer (Code/ssml_models/cascading_model/QwenA.py:
502-537, CausalLMOutput logits + torch CE).

This kernel computes the row-wise online logsumexp of h @ W tile by
tile in VMEM (flash-attention-style running max/sum over vocab tiles),
picks the target logit in the same pass, and in the backward recomputes
each logits tile and feeds (softmax − onehot)·g straight into the
dx matmul — still in VMEM. HBM traffic drops to a few reads of W
(~58 MB each at the bench shape) plus h and dh; FLOPs are unchanged
(the frozen LoRA head needs no dW, matching training.make_train_step's
trainable-leaf masking).

Tiling: grid (N/BN, V/BV) with the vocab axis fastest; h's block index
is constant along it, so Pallas keeps the h tile resident and streams
only W. Running max / sumexp / picked-logit live in (BN, 1) VMEM
scratch across the vocab sweep; the backward accumulates dh in a
(BN, D) f32 scratch and writes it once per row tile.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 1024
BLOCK_N_BWD = 1024
BLOCK_V = 512
BLOCK_V_BWD = 128

_NEG = -1e30


def _fwd_kernel(h_ref, w_ref, t_ref, nll_ref, lse_ref, m_ref, s_ref, p_ref, *, bv):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        s_ref[...] = jnp.zeros_like(s_ref)
        p_ref[...] = jnp.zeros_like(p_ref)

    l = jax.lax.dot_general(
        h_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    tile_max = jnp.max(l, axis=1, keepdims=True)
    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, tile_max)
    s_ref[...] = s_ref[...] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(l - m_new), axis=1, keepdims=True
    )
    m_ref[...] = m_new
    cols = j * bv + jax.lax.broadcasted_iota(jnp.int32, l.shape, 1)
    p_ref[...] += jnp.sum(
        jnp.where(cols == t_ref[...], l, 0.0), axis=1, keepdims=True
    )

    @pl.when(j == nj - 1)
    def _finish():
        lse = m_ref[...] + jnp.log(s_ref[...])
        lse_ref[...] = lse
        nll_ref[...] = lse - p_ref[...]


def _bwd_kernel(h_ref, w_ref, t_ref, lse_ref, g_ref, dh_ref, *, bv):
    # dh accumulates straight into the (revisited) f32 output block — a
    # separate scratch pushed the kernel over the 16 MB scoped-VMEM limit
    # at larger token counts
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dh_ref[...] = jnp.zeros_like(dh_ref)

    l = jax.lax.dot_general(
        h_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp(l - lse_ref[...])
    cols = j * bv + jax.lax.broadcasted_iota(jnp.int32, l.shape, 1)
    onehot = (cols == t_ref[...]).astype(jnp.float32)
    coef = ((p - onehot) * g_ref[...]).astype(w_ref.dtype)
    dh_ref[...] += jax.lax.dot_general(
        coef, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pad_rows(x, bn):
    n = x.shape[0]
    np_ = -(-n // bn) * bn
    if np_ == n:
        return x
    pad = [(0, np_ - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ce_rows(h, w, t2d, interpret):
    nll, _ = _fwd_call(h, w, t2d, interpret)
    return nll


def _fwd_call(h, w, t2d, interpret):
    n, d = h.shape
    v = w.shape[1]
    bn, bv = min(BLOCK_N, n), BLOCK_V
    nll, lse = pl.pallas_call(
        partial(_fwd_kernel, bv=bv),
        grid=(n // bn, v // bv),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, bv), lambda i, j: (0, j)),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, 1), jnp.float32),
            pltpu.VMEM((bn, 1), jnp.float32),
            pltpu.VMEM((bn, 1), jnp.float32),
        ],
        interpret=interpret,
    )(h, w, t2d)
    return nll, lse


def _ce_rows_fwd(h, w, t2d, interpret):
    nll, lse = _fwd_call(h, w, t2d, interpret)
    return nll, (h, w, t2d, lse)


def _ce_rows_bwd(interpret, res, g):
    h, w, t2d, lse = res
    n, d = h.shape
    v = w.shape[1]
    # W re-streams once per row tile (Ni × 58 MB at the bench shape), so
    # keep the row block LARGE and shrink the vocab tile instead to stay
    # under the 16 MB scoped-VMEM cap with the f32 dh accumulator block.
    # n arrives padded to the forward block, so it divides whenever it
    # exceeds the block.
    bn = BLOCK_N_BWD if n % BLOCK_N_BWD == 0 else n
    bv = BLOCK_V_BWD
    dh = pl.pallas_call(
        partial(_bwd_kernel, bv=bv),
        grid=(n // bn, v // bv),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, bv), lambda i, j: (0, j)),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
    )(h, w, t2d, lse, g)
    # dW is never needed (the LM head is frozen in the LoRA step); the
    # zeros are dead code XLA eliminates when w isn't differentiated
    return dh.astype(h.dtype), jnp.zeros_like(w), None


_ce_rows.defvjp(_ce_rows_fwd, _ce_rows_bwd)


def linear_ce_supported(d: int, v: int) -> bool:
    return d % 128 == 0 and v % BLOCK_V == 0


def linear_ce_rows(h, w, tgt, interpret: bool = False):
    """Per-token NLL [N] f32 of targets under softmax(h @ W), fused.

    h [N, D] (bf16/f32), w [D, V], tgt [N] int32. Requires
    ``linear_ce_supported(D, V)``. Rows pad to the block size internally;
    padded rows return the (finite) NLL of target 0 on zero logits —
    mask them out in the caller's reduction."""
    n = h.shape[0]
    bn = min(BLOCK_N, -(-n // 8) * 8)  # sublane multiple
    hp = _pad_rows(h, bn)
    tp = _pad_rows(tgt.astype(jnp.int32)[:, None], bn)
    nll = _ce_rows(hp, w, tp, interpret)
    return nll[:n, 0]
