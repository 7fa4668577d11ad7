"""Decoder-only LLM (Qwen2-family geometry) with LoRA, written for pjit.

The TPU-native replacement for the reference's cascaded Qwen2.5-7B stages
(Code/ssml_models/cascading_model/QwenA.py, QwenB.py): stage A tags break
positions in plain text, stage B fills prosody values into a templated
SSML — both are instruction-tuned causal LMs with LoRA adapters. The
architecture here is a fresh flax implementation of the same family:
RMSNorm (pre-norm), rotary position embeddings, grouped-query attention,
SwiGLU MLP, untied LM head — dimensioned by config (``qwen25_7b`` preset
matches the reference's checkpoints; ``tiny`` runs in tests).

Sharding is externalized: ``parallel.sharding.llm_param_spec`` maps this
module's parameter tree onto a ("data", "model") mesh (megatron-style TP:
qkv/gate/up column-split, o/down row-split), and the train step in
``training.py`` jits with those shardings — XLA inserts the collectives.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .lora import LoRADense


@dataclass(frozen=True)
class LLMConfig:
    vocab_size: int = 8192
    dim: int = 256
    layers: int = 2
    heads: int = 8
    kv_heads: int = 2
    ffn: int = 512
    max_len: int = 1024  # QwenA.py:478 truncation
    rope_theta: float = 1e6
    lora_rank: int = 8  # QwenA.py:183
    lora_alpha: float = 16.0
    dtype: jnp.dtype = jnp.bfloat16
    # weight-only base-kernel storage: None (float) | "int8" (per-channel)
    # | "nf4" (4-bit blockwise, the checkpoint/train format) | "int8b"
    # (blockwise int8 — NF4 recoded for serving, quant.recode_params_
    # nf4_serving). QwenB.py:100-113 loads the 7B base in NF4; models.quant
    quant: str | None = None
    # training-path attention: "dot" (mask+softmax with the [B,H,L,L]
    # score tensor in HBM) | "flash" (Pallas TPU flash attention — scores
    # stay in VMEM tiles, fwd AND bwd). "flash" applies only to the pure
    # causal no-cache shape; decode and padded-mask calls use "dot".
    # Measured on v5e at the train-bench geometry (B8 L512 d896):
    # dot 33.6 ms/step vs flash 58.9 — the upstream flash bwd loses at
    # this small head_dim/L; keep "dot" unless L is long.
    attn_impl: str = "dot"
    # fuse q|k|v and gate|up into ONE matmul each at apply time (LoRA
    # adapters ride along as [A_q|A_k|A_v] + a block-diagonal B): the
    # activation x is read from HBM once instead of 3× (+3× for the
    # rank-8 LoRA matmuls, which are 8-lane MXU misfits on their own).
    # Parameter tree, initializers, and checkpoints are unchanged — the
    # concat happens inside the program. Training-path knob; serving
    # already runs the statically fused layout (fuse_decode_params).
    fused_qkv: bool = False
    # rematerialize each decoder layer in the backward pass: activations
    # (incl. the [B,H,L,L] scores) are recomputed instead of stored.
    # Measured on v5e at B8/16/32 L512 d896: full remat LOSES throughput
    # (MFU 0.289/0.267/0.266 vs 0.349/0.336/0.332 without) — the step is
    # already HBM-bound and recompute re-reads the same weights. Keep
    # False for speed; the flag exists for memory-limited long-L shapes.
    remat: bool = False
    # with remat=True: None → save nothing (full recompute); "dots" →
    # jax.checkpoint_policies.dots_saveable (matmul outputs saved,
    # elementwise/norm/rope intermediates recomputed — no weight re-reads).
    # Measured on v5e (B8 L512 d896, fused CE): dots-policy remat ALSO
    # loses — 33 ms/step vs 30.6 without remat, for either attention
    # impl — the recomputed elementwise work costs more than the saved
    # activation traffic at this HBM-bound shape. Both flags stay off on
    # the production path; they exist for memory-limited long-L shapes.
    remat_policy: str | None = None

    @classmethod
    def tiny(cls, vocab_size: int = 512) -> "LLMConfig":
        return cls(vocab_size=vocab_size, dim=64, layers=2, heads=4, kv_heads=2, ffn=128, max_len=128)

    @classmethod
    def qwen25_7b(cls, vocab_size: int = 152064) -> "LLMConfig":
        return cls(
            vocab_size=vocab_size,
            dim=3584,
            layers=28,
            heads=28,
            kv_heads=4,
            ffn=18944,
            max_len=1024,
            rope_theta=1e6,
        )

    @property
    def head_dim(self) -> int:
        return self.dim // self.heads


def rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding, half-split (GPT-NeoX/Qwen2) convention so ported
    HF checkpoints match bit-for-bit. x: [..., L, H, D]; positions: [..., L]."""
    d = x.shape[-1]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = positions[..., :, None].astype(jnp.float32)[..., None, :] * freqs  # [..., L, 1, D/2]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    y1 = x1 * cos - x2 * sin
    y2 = x2 * cos + x1 * sin
    return jnp.concatenate([y1, y2], axis=-1).astype(x.dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale.astype(x.dtype)


def _fused_lora_matmul(x, parts, alpha: float):
    """One matmul over N concatenated LoRADense parameter surfaces.

    ``parts`` are ``(kernel, bias, lora_a, lora_b)`` tuples from
    LoRADense's parameter-surface mode (all with bias or none, all with
    adapters or none). Computes the per-projection outputs side by side:
    ``x @ [W1|…|WN] + [b1|…|bN] + (α/r)·(x @ [A1|…|AN]) @ blockdiag(B)``.
    Each output column's contraction is unchanged (the off-block zeros of
    blockdiag(B) contribute exact 0.0 terms), so results match the
    per-projection matmuls; x streams from HBM once instead of N (+N
    adapter) times."""
    w = jnp.concatenate([p[0] for p in parts], axis=1)
    y = jnp.dot(x, w)
    if parts[0][1] is not None:
        y = y + jnp.concatenate([p[1] for p in parts]).astype(y.dtype)
    if parts[0][2] is not None:
        rank = parts[0][2].shape[1]
        acat = jnp.concatenate([p[2] for p in parts], axis=1).astype(x.dtype)
        bblk = jnp.zeros((len(parts) * rank, y.shape[-1]), x.dtype)
        col = 0
        for i, p in enumerate(parts):
            f = p[3].shape[1]
            bblk = bblk.at[i * rank : (i + 1) * rank, col : col + f].set(
                p[3].astype(x.dtype)
            )
            col += f
        y = y + (alpha / rank) * jnp.dot(jnp.dot(x, acat), bblk)
    return y


class Attention(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x, positions, mask, cache=None):
        c = self.cfg
        hd = c.head_dim
        # q/k/v carry biases (Qwen2 convention); o does not
        qd = LoRADense(c.heads * hd, c.lora_rank, c.lora_alpha, use_bias=True, dtype=c.dtype, quant=c.quant, in_features=c.dim, name="q")
        kd = LoRADense(c.kv_heads * hd, c.lora_rank, c.lora_alpha, use_bias=True, dtype=c.dtype, quant=c.quant, in_features=c.dim, name="k")
        vd = LoRADense(c.kv_heads * hd, c.lora_rank, c.lora_alpha, use_bias=True, dtype=c.dtype, quant=c.quant, in_features=c.dim, name="v")
        if c.fused_qkv:
            nq, nkv = c.heads * hd, c.kv_heads * hd
            qkv = _fused_lora_matmul(x, [qd(None), kd(None), vd(None)], c.lora_alpha)
            q, k, v = qkv[..., :nq], qkv[..., nq : nq + nkv], qkv[..., nq + nkv :]
        else:
            q, k, v = qd(x), kd(x), vd(x)
        B, L = x.shape[0], x.shape[1]
        q = q.reshape(B, L, c.heads, hd)
        k = k.reshape(B, L, c.kv_heads, hd)
        v = v.reshape(B, L, c.kv_heads, hd)
        q = rope(q, positions, c.rope_theta)
        k = rope(k, positions, c.rope_theta)

        if cache is not None:
            ck, cv, cache_pos = cache
            k = jax.lax.dynamic_update_slice(ck, k, (0, cache_pos, 0, 0))
            v = jax.lax.dynamic_update_slice(cv, v, (0, cache_pos, 0, 0))
            new_cache = (k, v)
        else:
            new_cache = None

        group = c.heads // c.kv_heads
        if mask is None and c.attn_impl == "vmem":
            # pure-causal training shape, short L: whole-row scores live in
            # VMEM (ops/vmem_attn) — zero [B,H,L,L] HBM traffic fwd AND bwd,
            # no K/V repeat (GQA handled by the kernel's index maps)
            from ..ops.vmem_attn import causal_attention_vmem

            out = causal_attention_vmem(
                q, k, v, float(1.0 / np.sqrt(hd)),
                jax.default_backend() != "tpu",  # interpret off-TPU
            )
            out = out.reshape(B, L, c.heads * hd)
        elif mask is None:
            # pure-causal training shape routed to the Pallas TPU flash
            # kernel (cfg.attn_impl == "flash"): the [B,H,L,L] scores —
            # 58 MB × layers × (fwd+bwd) of HBM traffic at the train-bench
            # geometry — never leave VMEM. K/V repeat to full heads first;
            # at 29 MB that is far cheaper than one score materialization.
            from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

            qf = q.transpose(0, 2, 1, 3)  # [B, H, L, D]
            kf = jnp.repeat(k, group, axis=2).transpose(0, 2, 1, 3)
            vf = jnp.repeat(v, group, axis=2).transpose(0, 2, 1, 3)
            out = flash_attention(qf, kf, vf, causal=True, sm_scale=float(1.0 / np.sqrt(hd)))
            out = out.transpose(0, 2, 1, 3).reshape(B, L, c.heads * hd)
        else:
            # GQA without materializing repeated K/V: queries fold into
            # [kv_heads, group] so K/V are read once from HBM — with a
            # cached decode at S=512 the jnp.repeat formulation streamed
            # group× the cache bytes every step
            qg = q.reshape(B, L, c.kv_heads, group, hd)
            att = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k) / jnp.sqrt(hd).astype(q.dtype)
            att = jnp.where(mask[:, None, None, :, :], att, jnp.finfo(att.dtype).min)
            att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
            out = jnp.einsum("bhgqk,bkhd->bqhgd", att, v).reshape(B, L, c.heads * hd)
        out = LoRADense(c.dim, c.lora_rank, c.lora_alpha, dtype=c.dtype, quant=c.quant, name="o")(out)
        return out, new_cache


class MLP(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        gd = LoRADense(c.ffn, c.lora_rank, c.lora_alpha, dtype=c.dtype, quant=c.quant, in_features=c.dim, name="gate")
        ud = LoRADense(c.ffn, c.lora_rank, c.lora_alpha, dtype=c.dtype, quant=c.quant, in_features=c.dim, name="up")
        if c.fused_qkv:
            gu = _fused_lora_matmul(x, [gd(None), ud(None)], c.lora_alpha)
            gate, up = gu[..., : c.ffn], gu[..., c.ffn :]
        else:
            gate, up = gd(x), ud(x)
        return LoRADense(c.dim, c.lora_rank, c.lora_alpha, dtype=c.dtype, quant=c.quant, name="down")(
            jax.nn.silu(gate) * up
        )


class DecoderLayer(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x, positions, mask, cache=None):
        h, new_cache = Attention(self.cfg, name="attn")(
            RMSNorm(name="ln1")(x), positions, mask, cache
        )
        x = x + h
        x = x + MLP(self.cfg, name="mlp")(RMSNorm(name="ln2")(x))
        return x, new_cache


class DecoderLM(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, ids, positions=None, kv_caches=None, cache_pos=None, attn_mask=None, return_hidden=False):
        """Training: ids [B, L] → logits [B, L, V] (causal mask).
        Decoding: pass kv_caches [(k,v)×layers] and cache_pos."""
        c = self.cfg
        B, L = ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(L), (B, L))
        x = nn.Embed(c.vocab_size, c.dim, dtype=c.dtype, name="embed")(ids)

        if kv_caches is None:
            # flash kernel blocks are 128-wide; short shapes (e.g. the [1,8]
            # init trace) take the dot path. "vmem" holds the whole [L,L]
            # score block in VMEM — bounded to MAX_L (512)
            from ..ops.vmem_attn import MAX_L as _VMEM_MAX_L

            kernel_ok = (
                (c.attn_impl == "flash" and L >= 128 and L % 128 == 0)
                or (c.attn_impl == "vmem" and L % 128 == 0 and L <= _VMEM_MAX_L)
            )
            if kernel_ok and attn_mask is None:
                mask = None  # Attention routes mask=None to the pallas kernel
            else:
                causal = jnp.tril(jnp.ones((L, L), bool))
                mask = causal[None, :, :]
                if attn_mask is not None:
                    mask = mask & attn_mask[:, None, :]
        else:
            kl = kv_caches[0][0].shape[1]
            mask = (jnp.arange(kl)[None, None, :] <= positions[:, :, None])

        new_caches = []
        layer_cls = DecoderLayer
        if c.remat and kv_caches is None:
            policy = (
                jax.checkpoint_policies.dots_saveable
                if c.remat_policy == "dots"
                else None
            )
            layer_cls = nn.remat(DecoderLayer, static_argnums=(), policy=policy)
        for i in range(c.layers):
            cache = None
            if kv_caches is not None:
                cache = (kv_caches[i][0], kv_caches[i][1], cache_pos)
            x, nc = layer_cls(c, name=f"layer_{i}")(x, positions, mask, cache)
            new_caches.append(nc)
        x = RMSNorm(name="ln_f")(x)
        if return_hidden:
            # fused-CE training path (ops/fused_ce): the caller feeds the
            # final hidden state + the raw lm_head kernel to the Pallas
            # linear-CE — [B,L,V] logits never materialize
            return x
        logits = nn.Dense(c.vocab_size, use_bias=False, dtype=jnp.float32, name="lm_head")(
            x.astype(jnp.float32)
        )
        return (logits, new_caches) if kv_caches is not None else logits


def init_kv_caches(cfg: LLMConfig, batch: int, max_len: int):
    hd = cfg.head_dim
    return [
        (
            jnp.zeros((batch, max_len, cfg.kv_heads, hd), cfg.dtype),
            jnp.zeros((batch, max_len, cfg.kv_heads, hd), cfg.dtype),
        )
        for _ in range(cfg.layers)
    ]


def causal_lm_loss(logits, ids, loss_mask):
    """Next-token CE with instruction masking (labels = ids shifted; only
    positions where loss_mask=1 count — QwenA.py:111-113 masks the prompt).

    Written as gather − logsumexp rather than log_softmax: identical value,
    but log_softmax would materialize a second [B, L, V] f32 tensor (537 MB
    at the train-bench geometry) purely to be gathered from — the dominant
    avoidable HBM write in the whole train step."""
    lg = logits[:, :-1]
    tgt = ids[:, 1:]
    picked = jnp.take_along_axis(lg, tgt[..., None], axis=-1)[..., 0]
    ll = picked - jax.nn.logsumexp(lg, axis=-1)
    m = loss_mask[:, 1:].astype(ll.dtype)
    return -jnp.sum(ll * m) / jnp.maximum(jnp.sum(m), 1.0)


def causal_lm_loss_fused(hidden, head_w, ids, loss_mask, interpret: bool = False):
    """causal_lm_loss computed by the Pallas fused linear-CE: same
    gather − logsumexp formula, but the [B,L,V] logits tensor never exists
    in HBM — the kernel sweeps vocab tiles in VMEM (ops/fused_ce).
    Numerics: the head matmul runs in ``hidden.dtype`` (bf16 on the train
    path; accumulation in f32 via preferred_element_type) while the dense
    ``causal_lm_loss`` path computes lm_head logits in f32, so the two
    loss_impl values agree only to ~1e-3 rel on TPU — comparable within a
    run, not across loss_impl switches. ``hidden`` is the post-ln_f state
    from ``model.apply(..., return_hidden=True)``; ``head_w`` the raw
    lm_head kernel [D, V] (frozen in the LoRA step — no dW is ever
    computed)."""
    from ..ops.fused_ce import linear_ce_rows

    B, L, D = hidden.shape
    h = hidden[:, :-1].reshape((B * (L - 1), D))
    tgt = ids[:, 1:].reshape(-1)
    m = loss_mask[:, 1:].reshape(-1).astype(jnp.float32)
    nll = linear_ce_rows(h, head_w.astype(hidden.dtype), tgt, interpret)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def greedy_generate(model: DecoderLM, params, prompt_ids, max_new: int, eos_id: int | None = None):
    """KV-cache greedy decoding — prefill + lax.while_loop decode compiled
    as ONE program (a single executable launch per call; the eager variant
    paid one dispatch per op for the prefill, which over the ~30 ms-launch
    axon tunnel dwarfed the on-chip work).

    prompt_ids: [B, P] (right-padded prompts not supported here — serve
    fixed-length prompts or left-pad upstream)."""
    return _greedy_impl(model, params, prompt_ids, max_new, eos_id)


@partial(jax.jit, static_argnums=(0, 3, 4))
def _greedy_impl(model: DecoderLM, params, prompt_ids, max_new: int, eos_id: int | None):
    cfg = model.cfg
    B, P = prompt_ids.shape
    total = P + max_new
    caches = init_kv_caches(cfg, B, total)

    # prefill
    positions = jnp.broadcast_to(jnp.arange(P), (B, P))
    logits, caches = model.apply(params, prompt_ids, positions=positions, kv_caches=caches, cache_pos=0)
    last = jnp.argmax(logits[:, -1], axis=-1)

    tokens = jnp.zeros((B, total), jnp.int32)
    tokens = tokens.at[:, :P].set(prompt_ids).at[:, P].set(last)

    def cond(state):
        step, tokens, caches, done = state
        return (step < max_new - 1) & ~jnp.all(done)

    def body(state):
        step, tokens, caches, done = state
        pos = P + step
        ids = jax.lax.dynamic_slice(tokens, (0, pos), (B, 1))
        positions = jnp.full((B, 1), pos)
        logits, caches = model.apply(params, ids, positions=positions, kv_caches=caches, cache_pos=pos)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        if eos_id is not None:
            done = done | (nxt == eos_id)
            nxt = jnp.where(done, eos_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None].astype(jnp.int32), (0, pos + 1))
        return step + 1, tokens, caches, done

    done0 = jnp.zeros((B,), bool) if eos_id is not None else jnp.zeros((B,), bool)
    _, tokens, _, _ = jax.lax.while_loop(cond, body, (0, tokens, caches, done0))
    return tokens


# ---------------------------------------------------------------------------
# Fused serving path
#
# The training module keeps q/k/v/gate/up as separate LoRADense kernels
# (they shard and train independently); a decode step at small batch is
# weight-stream-bound, so serving wants the OPPOSITE layout: LoRA folded
# into the base (merge_lora math), q|k|v and gate|up concatenated into one
# kernel each, and everything stored bf16 — half the HBM bytes of the f32
# training tree and ~3 fewer kernel launches per layer per step. This is
# the standard inference-engine transform (what vLLM/TensorRT do to HF
# checkpoints), done here as a pure pytree→pytree function.


def fuse_decode_params(params, cfg: LLMConfig, dtype=jnp.bfloat16):
    """Training param tree → fused bf16 serving tree (LoRA folded in).

    Not applicable to quantized trees (kernel_q storage) — the quantized
    7B path keeps per-projection kernels so dequant fuses into each
    matmul; this fusion targets the float fine-tuned stages."""
    p = params["params"] if "params" in params else params

    def folded(d):
        k = d["kernel"]
        if "lora_a" in d:
            rank = d["lora_a"].shape[-1]
            k = k + (cfg.lora_alpha / rank) * d["lora_a"] @ d["lora_b"]
        return k.astype(dtype)

    def bias(d, width):
        b = d.get("bias")
        return (b if b is not None else jnp.zeros((width,), jnp.float32)).astype(dtype)

    hd = cfg.head_dim
    layers = []
    for i in range(cfg.layers):
        lp = p[f"layer_{i}"]
        at, mlp = lp["attn"], lp["mlp"]
        if "kernel" not in at["q"]:
            raise ValueError("fuse_decode_params: quantized trees are not fusable")
        wqkv = jnp.concatenate([folded(at["q"]), folded(at["k"]), folded(at["v"])], axis=1)
        bqkv = jnp.concatenate(
            [
                bias(at["q"], cfg.heads * hd),
                bias(at["k"], cfg.kv_heads * hd),
                bias(at["v"], cfg.kv_heads * hd),
            ]
        )
        layers.append(
            {
                "wqkv": wqkv,
                "bqkv": bqkv,
                "wo": folded(at["o"]),
                "wgu": jnp.concatenate([folded(mlp["gate"]), folded(mlp["up"])], axis=1),
                "wdown": folded(mlp["down"]),
                "ln1": lp["ln1"]["scale"].astype(dtype),
                "ln2": lp["ln2"]["scale"].astype(dtype),
            }
        )
    return {
        "embed": p["embed"]["embedding"].astype(dtype),
        "ln_f": p["ln_f"]["scale"].astype(dtype),
        "lm_head": p["lm_head"]["kernel"].astype(dtype),
        "layers": layers,
    }


def quantize_fused_decode_params(fp, block: int = 64, mode: str = "int8b"):
    """Fused serving tree → int8 weight stream.

    Every streamed matmul weight (wqkv, wo, wgu, wdown per layer, plus
    lm_head) becomes {"codes": int8 [K, N], "scale": f32 [K/block, N]}
    (mode="int8b", blockwise — quant.matmul_int8_block partial path) or
    {"codes": int8 [K, N], "scale": f32 [N]} (mode="int8", per-output-
    channel — XLA hoists the scale out of the dot, so the stream runs at
    the dense dot's efficiency); embed, biases and norm scales stay float.
    Decode steps then read ~1 byte/param instead of 2. Host-side numpy
    quantization: no device-memory spike."""
    from .quant import quantize_kernel_int8, quantize_kernel_int8_block

    def q2(w):
        if mode == "int8":
            q, s = quantize_kernel_int8(np.asarray(w, np.float32))
        else:
            q, s = quantize_kernel_int8_block(np.asarray(w, np.float32), block)
        return {"codes": jnp.asarray(q), "scale": jnp.asarray(s)}

    layers = [
        {
            **lw,
            "wqkv": q2(lw["wqkv"]),
            "wo": q2(lw["wo"]),
            "wgu": q2(lw["wgu"]),
            "wdown": q2(lw["wdown"]),
        }
        for lw in fp["layers"]
    ]
    return {**fp, "layers": layers, "lm_head": q2(fp["lm_head"])}


def _fused_mm(x, w):
    """x @ w for a fused-tree weight: plain array (bf16 stream) or the
    int8b dict from quantize_fused_decode_params — decode-row counts take
    quant.matmul_int8_block's partial path (scales applied to f32 partial
    sums, weight stream at the codes' byte rate); prefill falls back to
    dense dequant inside the same helper (MXU-bound there)."""
    if isinstance(w, dict):
        if w["scale"].ndim == 1:  # per-channel: XLA hoists the scale
            y = jnp.dot(x, w["codes"].astype(x.dtype))
            return (y * w["scale"].astype(jnp.float32)).astype(x.dtype)
        from .quant import matmul_int8_block

        block = w["codes"].shape[0] // w["scale"].shape[0]
        return matmul_int8_block(x, w["codes"], w["scale"], x.dtype, block)
    return x @ w


def _fused_rmsnorm(x, scale, eps=1e-6):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps).astype(x.dtype)) * scale


def init_kv_caches_fused(cfg: LLMConfig, batch: int, max_len: int):
    """KV caches PACKED as [B, S, kv_heads*hd] for the fused serving path
    (kv_heads*hd = 128 at the Qwen geometries — exact bf16 lane tiles).
    The training layout ([B, S, kv_heads, hd], init_kv_caches) leaves the
    decode attention einsums reading the cache at ~13 % of HBM rate
    (measured at the bench geometry: ~670 µs attention vs ~375 µs for all
    61 weight matmuls, which stream at 0.85 of peak); logical reorderings
    don't move it. The packed layout feeds ops/decode_attn's Pallas
    kernel, which reads each row once at stream rate; the per-step update
    stays a [B, 1, C] dynamic_update_slice on the loop-carried buffer."""
    c = cfg.kv_heads * cfg.head_dim
    return [
        (
            jnp.zeros((batch, max_len, c), cfg.dtype),
            jnp.zeros((batch, max_len, c), cfg.dtype),
        )
        for _ in range(cfg.layers)
    ]


def _fused_forward(fp, cfg: LLMConfig, ids, positions, caches, cache_pos, last_only=False):
    """One fused-kernel forward over [B, L] ids with KV caches in the
    packed [B, S, kv_heads*hd] serving layout (init_kv_caches_fused).
    Returns (logits[B, L, V] float32, new_caches). With last_only, the
    LM head runs on the final position only ([B, 1, V]) — greedy decoding
    discards every other row, and at the bench prefill (P=64, V=32k) the
    full head is ~60× the FLOPs of the one row actually used.

    Decode steps (L == 1) run attention in ops/decode_attn (Pallas on
    TPU); prefill keeps the XLA einsum path over an unpacked view."""
    from ..ops.decode_attn import decode_attention

    hd = cfg.head_dim
    nq, nkv = cfg.heads * hd, cfg.kv_heads * hd
    B, L = ids.shape
    x = fp["embed"][ids]
    kl = caches[0][0].shape[1]
    group = cfg.heads // cfg.kv_heads
    if L > 1:
        mask = jnp.arange(kl)[None, None, :] <= positions[:, :, None]
    new_caches = []
    for lw, (ck, cv) in zip(fp["layers"], caches):
        h = _fused_rmsnorm(x, lw["ln1"])
        qkv = _fused_mm(h, lw["wqkv"]) + lw["bqkv"]
        q = qkv[..., :nq].reshape(B, L, cfg.heads, hd)
        k = qkv[..., nq : nq + nkv].reshape(B, L, cfg.kv_heads, hd)
        v = qkv[..., nq + nkv :]
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta).reshape(B, L, nkv)
        ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, cache_pos, 0))
        cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, cache_pos, 0))
        new_caches.append((ck, cv))
        if L == 1:
            out = decode_attention(q[:, 0], ck, cv, cache_pos, cfg.kv_heads)
            out = out.reshape(B, 1, nq)
        else:
            kk = ck.reshape(B, kl, cfg.kv_heads, hd)
            vv = cv.reshape(B, kl, cfg.kv_heads, hd)
            qg = q.reshape(B, L, cfg.kv_heads, group, hd)
            att = jnp.einsum("blhgd,bkhd->bhglk", qg, kk) / jnp.sqrt(hd).astype(q.dtype)
            att = jnp.where(mask[:, None, None, :, :], att, jnp.finfo(att.dtype).min)
            att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
            out = jnp.einsum("bhglk,bkhd->blhgd", att, vv).reshape(B, L, nq)
        x = x + _fused_mm(out, lw["wo"])
        h = _fused_rmsnorm(x, lw["ln2"])
        gu = _fused_mm(h, lw["wgu"])
        g, u = gu[..., : cfg.ffn], gu[..., cfg.ffn :]
        x = x + _fused_mm(jax.nn.silu(g) * u, lw["wdown"])
    if last_only:
        x = x[:, -1:]
    x = _fused_rmsnorm(x, fp["ln_f"])
    logits = _fused_mm(x, fp["lm_head"]).astype(jnp.float32)
    return logits, new_caches


@partial(jax.jit, static_argnums=(1, 3, 4))
def _greedy_fused_impl(fp, cfg: LLMConfig, prompt_ids, max_new: int, eos_id: int | None):
    B, P = prompt_ids.shape
    total = P + max_new
    caches = init_kv_caches_fused(cfg, B, total)
    if fp["embed"].dtype != cfg.dtype:
        caches = [(k.astype(fp["embed"].dtype), v.astype(fp["embed"].dtype)) for k, v in caches]

    positions = jnp.broadcast_to(jnp.arange(P), (B, P))
    logits, caches = _fused_forward(fp, cfg, prompt_ids, positions, caches, 0, last_only=True)
    last = jnp.argmax(logits[:, -1], axis=-1)
    tokens = jnp.zeros((B, total), jnp.int32)
    tokens = tokens.at[:, :P].set(prompt_ids).at[:, P].set(last)

    def cond(state):
        step, tokens, caches, done = state
        return (step < max_new - 1) & ~jnp.all(done)

    def body(state):
        step, tokens, caches, done = state
        pos = P + step
        ids = jax.lax.dynamic_slice(tokens, (0, pos), (B, 1))
        positions = jnp.full((B, 1), pos)
        logits, caches = _fused_forward(fp, cfg, ids, positions, caches, pos)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        if eos_id is not None:
            done = done | (nxt == eos_id)
            nxt = jnp.where(done, eos_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None].astype(jnp.int32), (0, pos + 1))
        return step + 1, tokens, caches, done

    done0 = jnp.zeros((B,), bool)
    _, tokens, _, _ = jax.lax.while_loop(cond, body, (0, tokens, caches, done0))
    return tokens


def greedy_generate_fused(fp, cfg: LLMConfig, prompt_ids, max_new: int, eos_id: int | None = None):
    """Greedy decode over a ``fuse_decode_params`` tree — the serving path
    (same one-launch prefill+decode contract as ``greedy_generate``)."""
    return _greedy_fused_impl(fp, cfg, prompt_ids, max_new, eos_id)
