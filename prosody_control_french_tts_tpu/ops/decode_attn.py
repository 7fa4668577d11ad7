"""Decode-step GQA attention over packed KV caches (Pallas, TPU).

The serving decode step is weight-stream-bound everywhere EXCEPT
attention: at the bench geometry (B=64, 12 layers, kv_heads=2, hd=64)
the 61 weight matmuls stream at ~0.85 of HBM peak (~375 µs) while the
XLA einsum attention + cache update costs ~670 µs — the KV read runs at
~13 % of HBM rate. Logical cache-layout permutations don't move it
(probed on v5e: [B,S,H,D] / [B,H,S,D] / K-transposed all within noise),
because the einsums' tiny M dims (group=7) and the (kv_heads, hd) =
(2, 64) minor tile force padded relayouts no matter the order.

This kernel owns the layout instead: caches live PACKED as
[B, S, C] with C = kv_heads*hd (= 128 — exact lane tiles, bf16), one
program per batch row reads that row's K and V exactly once at stream
rate, and GQA runs as two [S, hd] x [hd, group] MXU dots per kv head
with an f32 max-subtract softmax between them. The cache update stays
outside (a [B, 1, C] dynamic_update_slice — XLA aliases the loop-carried
buffer in place); the kernel is read-only on the caches.

Replaces the torch scaled_dot_product_attention the reference leans on
for its HF decode loop (Code/ssml_models/cascading_model/QwenA.py
generate path); here it is the decode half of models/llm._fused_forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_attention", "decode_attention_reference"]


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *, kv_heads, group, hd, S):
    pos = pos_ref[0]
    scale = 1.0 / float(np.sqrt(hd))
    live = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) <= pos  # [S, 1]
    for hh in range(kv_heads):
        kb = k_ref[0, :, hh * hd : (hh + 1) * hd]  # [S, hd]
        vb = v_ref[0, :, hh * hd : (hh + 1) * hd]  # [S, hd]
        qh = q_ref[0, hh * group : (hh + 1) * group, :]  # [group, hd]
        # scores[s, g] = k[s] . q[g] — contraction on hd keeps S on
        # sublanes, so the softmax reduction below is a lane-local max
        scores = jax.lax.dot_general(
            kb, qh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        scores = jnp.where(live, scores * scale, -1e30)
        m = jnp.max(scores, axis=0, keepdims=True)
        p = jnp.exp(scores - m)
        p = (p / jnp.sum(p, axis=0, keepdims=True)).astype(vb.dtype)
        outh = jax.lax.dot_general(
            p, vb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [group, hd]
        o_ref[0, hh * group : (hh + 1) * group, :] = outh.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_heads", "interpret"))
def _pallas_call(q, kc, vc, pos, kv_heads: int, interpret: bool):
    B, H, hd = q.shape
    S = kc.shape[1]
    group = H // kv_heads
    return pl.pallas_call(
        functools.partial(_kernel, kv_heads=kv_heads, group=group, hd=hd, S=S),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, hd), lambda b, pos: (b, 0, 0)),
                pl.BlockSpec((1, S, kv_heads * hd), lambda b, pos: (b, 0, 0)),
                pl.BlockSpec((1, S, kv_heads * hd), lambda b, pos: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, H, hd), lambda b, pos: (b, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, hd), q.dtype),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(pos, jnp.int32), (1,)), q, kc, vc)


def decode_attention_reference(q, kc, vc, pos, kv_heads: int):
    """Pure-XLA reference (and the CPU path): identical math, packed in."""
    B, H, hd = q.shape
    S = kc.shape[1]
    group = H // kv_heads
    k = kc.reshape(B, S, kv_heads, hd)
    v = vc.reshape(B, S, kv_heads, hd)
    qg = q.reshape(B, kv_heads, group, hd)
    att = jnp.einsum("bhgd,bshd->bhgs", qg, k).astype(jnp.float32) / np.sqrt(hd)
    att = jnp.where(jnp.arange(S)[None, None, None, :] <= pos, att, -1e30)
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    return jnp.einsum("bhgs,bshd->bhgd", att, v).reshape(B, H, hd)


def decode_attention(q, kc, vc, pos, kv_heads: int):
    """One decode step of causal GQA attention.

    q: [B, H, hd] (this step's query, rope applied);
    kc, vc: [B, S, kv_heads*hd] packed caches (position ``pos`` already
    written); pos: scalar int32 — attend to cache rows 0..pos inclusive.
    Returns [B, H, hd] in q's dtype.
    """
    if jax.default_backend() == "tpu":
        return _pallas_call(q, kc, vc, pos, kv_heads, False)
    return decode_attention_reference(q, kc, vc, pos, kv_heads)
