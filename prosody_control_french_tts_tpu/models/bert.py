"""BERT-style encoder + break-tagging head (flax).

TPU-native counterpart of the reference's break predictor
(Code/baseline_models/pause_bert.py): token classification with two labels
(BREAK / NO_BREAK), the BREAK label on the last word before a ``<break>``
(:54-63), first-subtoken labeling (:74-91). The encoder is written fresh
in flax — pre-LN transformer, learned positions, GELU — sized by config
(defaults match bert-base-multilingual-uncased's geometry so published
weights *could* be ported, but training from scratch on the exported
corpus is the hermetic path).

Inference is the second north-star benchmark (BASELINE.md: SSML
sentences/sec, batched jit).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 8000
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    ffn: int = 3072
    max_len: int = 128  # pause_bert.py:15 window
    dropout: float = 0.1
    num_labels: int = 2  # BREAK / NO_BREAK

    @classmethod
    def tiny(cls, vocab_size: int = 8000) -> "BertConfig":
        return cls(vocab_size=vocab_size, hidden=128, layers=2, heads=4, ffn=512)


class SelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        c = self.cfg
        head_dim = c.hidden // c.heads
        qkv = nn.DenseGeneral((3, c.heads, head_dim), name="qkv", dtype=jnp.bfloat16)(x)
        q, k, v = jnp.moveaxis(qkv, -3, 0)
        att = jnp.einsum("...qhd,...khd->...hqk", q, k) / jnp.sqrt(head_dim).astype(q.dtype)
        att = jnp.where(mask[..., None, None, :], att, jnp.finfo(att.dtype).min)
        att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
        att = nn.Dropout(c.dropout)(att, deterministic=deterministic)
        out = jnp.einsum("...hqk,...khd->...qhd", att, v)
        return nn.DenseGeneral(c.hidden, axis=(-2, -1), name="out", dtype=jnp.bfloat16)(out)


class Block(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        c = self.cfg
        h = nn.LayerNorm(dtype=jnp.float32)(x)
        x = x + nn.Dropout(c.dropout)(
            SelfAttention(c)(h, mask, deterministic), deterministic=deterministic
        )
        h = nn.LayerNorm(dtype=jnp.float32)(x)
        h = nn.Dense(c.ffn, dtype=jnp.bfloat16)(h)
        h = jax.nn.gelu(h)
        h = nn.Dense(c.hidden, dtype=jnp.bfloat16)(h)
        return x + nn.Dropout(c.dropout)(h, deterministic=deterministic)


class BertEncoder(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, ids, mask, deterministic: bool = True):
        c = self.cfg
        x = nn.Embed(c.vocab_size, c.hidden, name="tok_emb", dtype=jnp.bfloat16)(ids)
        pos = nn.Embed(c.max_len, c.hidden, name="pos_emb", dtype=jnp.bfloat16)(
            jnp.arange(ids.shape[-1])
        )
        x = x + pos
        x = nn.Dropout(c.dropout)(x, deterministic=deterministic)
        for i in range(c.layers):
            x = Block(c, name=f"layer_{i}")(x, mask, deterministic)
        return nn.LayerNorm(dtype=jnp.float32)(x)


class BreakTagger(nn.Module):
    """Token-classification head over the encoder (pause_bert parity)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, ids, mask, deterministic: bool = True):
        h = BertEncoder(self.cfg, name="encoder")(ids, mask, deterministic)
        return nn.Dense(self.cfg.num_labels, dtype=jnp.float32, name="classifier")(h)


class SentenceEncoder(nn.Module):
    """Mean-pooled sentence embeddings — the hermetic replacement for the
    reference's downloaded sentence-transformer (bilstm.py:12-13)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, ids, mask, deterministic: bool = True):
        h = BertEncoder(self.cfg, name="encoder")(ids, mask, deterministic)
        m = mask[..., None].astype(h.dtype)
        pooled = jnp.sum(h * m, axis=-2) / jnp.maximum(jnp.sum(m, axis=-2), 1.0)
        return pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-6)


def cross_entropy_loss(logits, labels, label_mask):
    """Masked token-level CE (labels −100 ignored, HF convention the
    reference relies on, pause_bert.py:88-91)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(jnp.maximum(labels, 0), logits.shape[-1], dtype=logp.dtype)
    ll = jnp.sum(onehot * logp, axis=-1)
    mask = label_mask & (labels >= 0)
    return -jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1)
