"""VMEM-resident causal attention for short training sequences.

The LoRA train step at the SSML geometry (L=512, head_dim 64) is
HBM-bound, and the single largest traffic item is the attention score
tensor: the XLA dot path materializes [B,H,L,L] scores AND softmax
output in HBM, forward and backward — ~5 GB/step at the train-bench
shape (B8 H14 L512, 12 layers). The upstream Pallas flash-attention
kernel is built for long L (online softmax, 128-wide blocks) and
measured SLOWER than the dot path here (58.9 vs 33.6 ms/step on v5e:
head_dim 64 pads to 128-lane blocks and the multi-pass bwd re-streams
q/k/v per block row).

At L ≤ 512 the whole [L, L] score matrix for one (batch, head) is only
1 MB f32 — it fits in VMEM outright. So this kernel does the obvious
TPU-native thing: grid over (batch, q-head), load q/k/v rows for that
head once, compute scores → causal mask → softmax → out entirely in
VMEM, and in the backward recompute the probabilities from q/k (cheap
MXU work) instead of ever writing them to HBM. GQA needs no K/V
repeat: the k/v BlockSpec index map points q-head h at kv-head
h // group, and dk/dv accumulate across the group via output-block
revisiting (h is the fastest grid axis, so the same dk/dv block stays
resident for `group` consecutive steps).

Replaces the score-tensor HBM traffic of the reference's SDPA training
path (Code/ssml_models/cascading_model/QwenA.py:502-537 fine-tunes with
torch SDPA) with zero score traffic.

Layouts match models/llm.Attention: q [B, L, H, hd], k/v [B, L, KVH, hd].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Scores + softmax vjp intermediates are [L, L] f32 in VMEM; 512 keeps the
# backward's four such buffers ≈ 4 MB. Dispatchers fall back to the dot
# path above this.
MAX_L = 512

_NEG = -1e30


def _causal(L):
    li = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    return lj <= li


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale):
    L = q_ref.shape[2]
    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    s = jnp.where(_causal(L), s, _NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    # normalize on the [L, hd] output, not the [L, L] matrix (hd/L× less
    # VPU work)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0, :, :] = (o / l).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, sm_scale, group):
    h = pl.program_id(1)
    L = q_ref.shape[2]
    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, :, :]
    v = v_ref[0, 0, :, :]
    do = do_ref[0, 0, :, :]
    # recompute probabilities in VMEM (never saved to HBM)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale
    s = jnp.where(_causal(L), s, _NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    pl_ = p.astype(v.dtype)
    # dv = p^T @ do ; dp = do @ v^T ; ds = p ⊙ (dp − rowsum(dp ⊙ p))
    dv = jax.lax.dot_general(
        pl_, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    row = jnp.sum(dp * p, axis=1, keepdims=True)
    ds = (p * (dp - row) * sm_scale).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0, 0, :, :] = dq.astype(dq_ref.dtype)

    # dk/dv blocks are indexed by kv-head = h // group: the same output
    # block is revisited for `group` consecutive h steps — initialize on
    # the first, accumulate on the rest (f32 accumulators; cast outside)
    @pl.when(h % group == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    dk_ref[0, 0, :, :] += dk
    dv_ref[0, 0, :, :] += dv


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def causal_attention_vmem(q, k, v, sm_scale: float, interpret: bool = False):
    """out [B, L, H, hd] = causal softmax(q kᵀ · scale) v, scores VMEM-only.

    q [B, L, H, hd]; k, v [B, L, KVH, hd] with H % KVH == 0. L ≤ MAX_L.
    Forward and backward are single-launch Pallas programs; the backward
    recomputes probabilities instead of saving them (flash-attention
    rematerialization, specialized to whole-row blocks)."""
    return _fwd_call(q, k, v, sm_scale, interpret)


def _fwd_call(q, k, v, sm_scale, interpret):
    # Mosaic wants the block's LAST TWO dims tiled (÷8, ÷128 — or equal to
    # the array dims): compute in [B, H, L, hd] so blocks end in (L, hd)
    B, L, H, hd = q.shape
    KVH = k.shape[2]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    kv_spec = pl.BlockSpec((1, 1, L, hd), lambda b, h: (b, h // (H // KVH), 0, 0))
    out = pl.pallas_call(
        partial(_fwd_kernel, sm_scale=sm_scale),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, L, hd), lambda b, h: (b, h, 0, 0)),
            kv_spec,
            kv_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, L, hd), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, L, hd), q.dtype),
        interpret=interpret,
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)


def _vjp_fwd(q, k, v, sm_scale, interpret):
    return _fwd_call(q, k, v, sm_scale, interpret), (q, k, v)


def _vjp_bwd(sm_scale, interpret, res, do):
    q, k, v = res
    B, L, H, hd = q.shape
    KVH = k.shape[2]
    group = H // KVH
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot = do.transpose(0, 2, 1, 3)
    kv_spec = pl.BlockSpec((1, 1, L, hd), lambda b, h: (b, h // group, 0, 0))
    q_spec = pl.BlockSpec((1, 1, L, hd), lambda b, h: (b, h, 0, 0))
    dq, dk, dv = pl.pallas_call(
        partial(_bwd_kernel, sm_scale=sm_scale, group=group),
        grid=(B, H),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, L, hd), q.dtype),
            jax.ShapeDtypeStruct((B, KVH, L, hd), jnp.float32),
            jax.ShapeDtypeStruct((B, KVH, L, hd), jnp.float32),
        ],
        interpret=interpret,
    )(qt, kt, vt, dot)
    return (
        dq.transpose(0, 2, 1, 3),
        dk.transpose(0, 2, 1, 3).astype(k.dtype),
        dv.transpose(0, 2, 1, 3).astype(v.dtype),
    )


causal_attention_vmem.defvjp(_vjp_fwd, _vjp_bwd)
