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


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *, kv_heads, group, hd, S, rows):
    pos = pos_ref[0]
    scale = 1.0 / float(np.sqrt(hd))
    live = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1) <= pos  # [1, S]
    # Scores are laid out [group, S] so the cache length S rides the
    # 128-lane axis — the original [S, group] layout put group (= 7 at the
    # bench geometry) on lanes, wasting 95 % of every VPU/MXU op, which
    # made the kernel COMPUTE-bound at 187 µs/call vs 137 µs for the XLA
    # einsum. Multiple batch rows per program amortize the per-grid-step
    # fixed cost on top.
    for r in range(rows):
        for hh in range(kv_heads):
            kb = k_ref[r, :, hh * hd : (hh + 1) * hd]  # [S, hd]
            vb = v_ref[r, :, hh * hd : (hh + 1) * hd]  # [S, hd]
            qh = q_ref[r, hh * group : (hh + 1) * group, :]  # [group, hd]
            # scores[g, s] = q[g] . k[s] — contraction on hd, S on lanes
            scores = jax.lax.dot_general(
                qh, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [group, S]
            scores = jnp.where(live, scores * scale, -1e30)
            m = jnp.max(scores, axis=1, keepdims=True)
            p = jnp.exp(scores - m)
            p = (p / jnp.sum(p, axis=1, keepdims=True)).astype(vb.dtype)
            outh = jax.lax.dot_general(
                p, vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )  # [group, hd]
            o_ref[r, hh * group : (hh + 1) * group, :] = outh.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_heads", "interpret"))
def _pallas_call(q, kc, vc, pos, kv_heads: int, interpret: bool):
    B, H, hd = q.shape
    S = kc.shape[1]
    group = H // kv_heads
    rows = next(r for r in (8, 4, 2, 1) if B % r == 0)
    return pl.pallas_call(
        functools.partial(_kernel, kv_heads=kv_heads, group=group, hd=hd, S=S, rows=rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // rows,),
            in_specs=[
                pl.BlockSpec((rows, H, hd), lambda b, pos: (b, 0, 0)),
                pl.BlockSpec((rows, S, kv_heads * hd), lambda b, pos: (b, 0, 0)),
                pl.BlockSpec((rows, S, kv_heads * hd), lambda b, pos: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((rows, H, hd), lambda b, pos: (b, 0, 0)),
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
