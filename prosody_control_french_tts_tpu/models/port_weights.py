"""Port HuggingFace torch checkpoints into the flax model trees.

Zero-egress deployments train hermetically, but production users of the
reference arrive with published checkpoints (Qwen2.5-7B for the cascade,
Whisper for alignment — QwenA.py:145, use_whisper_timestamped.py). These
converters map torch ``state_dict``s onto this framework's parameter
trees; the parity tests build random-initialised HF models *from config*
(offline) and assert logit agreement, which pins the architectures
(half-split RoPE, GQA, qkv biases, pre-LN, sinusoidal/learned positions)
to the published geometry.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .llm import LLMConfig


def _t(w) -> np.ndarray:
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)


def _dense(sd, prefix: str, rank: int, in_f: int, out_f: int, bias: bool) -> dict:
    """torch Linear [out,in](+bias) → LoRADense tree (fresh zero adapters)."""
    out = {"kernel": jnp.asarray(_t(sd[prefix + ".weight"]).T, jnp.float32)}
    if bias:
        out["bias"] = jnp.asarray(_t(sd[prefix + ".bias"]), jnp.float32)
    if rank > 0:
        out["lora_a"] = jnp.zeros((in_f, rank), jnp.float32)
        out["lora_b"] = jnp.zeros((rank, out_f), jnp.float32)
    return out


def qwen2_to_flax(state_dict: dict, cfg: LLMConfig) -> dict:
    """HF Qwen2ForCausalLM state_dict → DecoderLM params."""
    sd = state_dict
    r = cfg.lora_rank
    hd = cfg.head_dim
    p: dict = {
        "embed": {"embedding": jnp.asarray(_t(sd["model.embed_tokens.weight"]), jnp.float32)},
        "ln_f": {"scale": jnp.asarray(_t(sd["model.norm.weight"]), jnp.float32)},
    }
    if "lm_head.weight" in sd:
        p["lm_head"] = {"kernel": jnp.asarray(_t(sd["lm_head.weight"]).T, jnp.float32)}
    else:  # tied embeddings
        p["lm_head"] = {"kernel": jnp.asarray(_t(sd["model.embed_tokens.weight"]).T, jnp.float32)}
    for i in range(cfg.layers):
        pre = f"model.layers.{i}"
        p[f"layer_{i}"] = {
            "ln1": {"scale": jnp.asarray(_t(sd[f"{pre}.input_layernorm.weight"]), jnp.float32)},
            "ln2": {"scale": jnp.asarray(_t(sd[f"{pre}.post_attention_layernorm.weight"]), jnp.float32)},
            "attn": {
                "q": _dense(sd, f"{pre}.self_attn.q_proj", r, cfg.dim, cfg.heads * hd, True),
                "k": _dense(sd, f"{pre}.self_attn.k_proj", r, cfg.dim, cfg.kv_heads * hd, True),
                "v": _dense(sd, f"{pre}.self_attn.v_proj", r, cfg.dim, cfg.kv_heads * hd, True),
                "o": _dense(sd, f"{pre}.self_attn.o_proj", r, cfg.heads * hd, cfg.dim, False),
            },
            "mlp": {
                "gate": _dense(sd, f"{pre}.mlp.gate_proj", r, cfg.dim, cfg.ffn, False),
                "up": _dense(sd, f"{pre}.mlp.up_proj", r, cfg.dim, cfg.ffn, False),
                "down": _dense(sd, f"{pre}.mlp.down_proj", r, cfg.ffn, cfg.dim, False),
            },
        }
    return {"params": p}


def llm_config_from_hf(hf_config) -> LLMConfig:
    return LLMConfig(
        vocab_size=hf_config.vocab_size,
        dim=hf_config.hidden_size,
        layers=hf_config.num_hidden_layers,
        heads=hf_config.num_attention_heads,
        kv_heads=hf_config.num_key_value_heads,
        ffn=hf_config.intermediate_size,
        rope_theta=getattr(hf_config, "rope_theta", 1e6),
        dtype=jnp.float32,
        lora_rank=0,
    )


# ---------------------------------------------------------------------------
# Whisper
# ---------------------------------------------------------------------------


def whisper_to_flax(state_dict: dict, cfg) -> dict:
    """HF WhisperForConditionalGeneration (or WhisperModel) state_dict →
    align.whisper_jax.WhisperModel params."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    H = cfg.heads

    def dg_in(prefix, bias=True):
        w = _t(sd[prefix + ".weight"]).T  # [in, out]
        in_f, out_f = w.shape
        out = {"kernel": jnp.asarray(w.reshape(in_f, H, out_f // H), jnp.float32)}
        if bias and prefix + ".bias" in sd:
            out["bias"] = jnp.asarray(_t(sd[prefix + ".bias"]).reshape(H, out_f // H), jnp.float32)
        return out

    def dg_out(prefix):
        w = _t(sd[prefix + ".weight"]).T  # [in(H*hd), out]
        in_f, out_f = w.shape
        return {
            "kernel": jnp.asarray(w.reshape(H, in_f // H, out_f), jnp.float32),
            "bias": jnp.asarray(_t(sd[prefix + ".bias"]), jnp.float32),
        }

    def ln(prefix):
        return {
            "scale": jnp.asarray(_t(sd[prefix + ".weight"]), jnp.float32),
            "bias": jnp.asarray(_t(sd[prefix + ".bias"]), jnp.float32),
        }

    def conv(prefix):
        w = _t(sd[prefix + ".weight"])  # [out, in, k]
        return {
            "kernel": jnp.asarray(np.transpose(w, (2, 1, 0)), jnp.float32),
            "bias": jnp.asarray(_t(sd[prefix + ".bias"]), jnp.float32),
        }

    def attn(hf_prefix):
        return {
            "q": dg_in(hf_prefix + ".q_proj"),
            "k": dg_in(hf_prefix + ".k_proj", bias=False),
            "v": dg_in(hf_prefix + ".v_proj"),
            "out": dg_out(hf_prefix + ".out_proj"),
        }

    def block(hf_prefix, cross: bool):
        out = {
            "attn": attn(hf_prefix + ".self_attn"),
            "ln_attn": ln(hf_prefix + ".self_attn_layer_norm"),
            "ln_ffn": ln(hf_prefix + ".final_layer_norm"),
            "fc1": {
                "kernel": jnp.asarray(_t(sd[hf_prefix + ".fc1.weight"]).T, jnp.float32),
                "bias": jnp.asarray(_t(sd[hf_prefix + ".fc1.bias"]), jnp.float32),
            },
            "fc2": {
                "kernel": jnp.asarray(_t(sd[hf_prefix + ".fc2.weight"]).T, jnp.float32),
                "bias": jnp.asarray(_t(sd[hf_prefix + ".fc2.bias"]), jnp.float32),
            },
        }
        if cross:
            out["cross"] = attn(hf_prefix + ".encoder_attn")
            out["ln_cross"] = ln(hf_prefix + ".encoder_attn_layer_norm")
        return out

    enc = {
        "conv1": conv("encoder.conv1"),
        "conv2": conv("encoder.conv2"),
        "ln_post": ln("encoder.layer_norm"),
    }
    for i in range(cfg.enc_layers):
        enc[f"block_{i}"] = block(f"encoder.layers.{i}", cross=False)
    dec = {
        "tok_emb": {"embedding": jnp.asarray(_t(sd["decoder.embed_tokens.weight"]), jnp.float32)},
        "pos_emb": jnp.asarray(_t(sd["decoder.embed_positions.weight"]), jnp.float32),
        "ln_post": ln("decoder.layer_norm"),
    }
    for i in range(cfg.dec_layers):
        dec[f"block_{i}"] = block(f"decoder.layers.{i}", cross=True)
    return {"params": {"encoder": enc, "decoder": dec}}
