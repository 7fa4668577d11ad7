"""Whisper-family encoder-decoder in flax, with word-level timestamps.

TPU-native replacement for the reference's primary aligner, the
whisper-timestamped stack (Code/Aligners/use_whisper_timestamped.py):

- architecture: log-mel front-end (ops.stft.log_mel), conv×2 (stride 2)
  encoder with sinusoidal positions, pre-LN transformer; decoder with
  learned positions, causal self-attention + cross-attention, tied
  embedding head — the Whisper geometry, written fresh, sized by config
  (``tiny``/``base``/... presets) so published weights can be ported via
  the npz loader (no network in this environment);
- word timestamps: DTW over the time-axis-normalised cross-attention
  matrix (the whisper-timestamped technique) → monotonic token↔frame
  path → per-token times → whitespace-grouped word intervals;
- the reference's audio gates and degraded outputs: RMS < 100 (int16
  scale) or silence ratio > 95 % → the "..." placeholder result
  (use_whisper_timestamped.py:197-261), preserved verbatim because
  downstream steps key on the "..." convention.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import log_mel
from ..utils.textgridio import TextGrid
from ..utils.wavio import Audio
from .base import AlignedWord, words_to_textgrid

SAMPLE_RATE = 16000
HOP = 160
FRAME_DT = 2 * HOP / SAMPLE_RATE  # encoder stride-2 → 20 ms per frame

# Process-wide memo of traced/jitted programs keyed by (kind, cfg, …).
# Tracing the 3-layer decode while_loop costs seconds of host time on this
# 1-vCPU box even when the XLA compile-cache hits, and every fresh
# WhisperAligner (the pipeline builds one per step that aligns) used to
# re-pay it; two models with equal configs trace to identical programs, so
# sharing by config is exact.
_TRACE_MEMO: dict = {}


def _memo_fn(key, builder):
    fn = _TRACE_MEMO.get(key)
    if fn is None:
        fn = builder()
        _TRACE_MEMO[key] = fn
    return fn


@dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    dtype: object = jnp.bfloat16
    n_audio_ctx: int = 1500  # 30 s windows
    n_text_ctx: int = 448
    dim: int = 384
    heads: int = 6
    enc_layers: int = 4
    dec_layers: int = 4
    vocab_size: int = 8000  # hermetic tokenizer; 51865 for ported weights

    @classmethod
    def tiny(cls, vocab_size: int = 8000) -> "WhisperConfig":
        return cls(dim=384, heads=6, enc_layers=4, dec_layers=4, vocab_size=vocab_size)

    @classmethod
    def test(cls, vocab_size: int = 256) -> "WhisperConfig":
        return cls(dim=64, heads=2, enc_layers=1, dec_layers=1, vocab_size=vocab_size, n_audio_ctx=200, n_text_ctx=64)

    @classmethod
    def base(cls, vocab_size: int = 51865) -> "WhisperConfig":
        return cls(dim=512, heads=8, enc_layers=6, dec_layers=6, vocab_size=vocab_size)

    @classmethod
    def small(cls, vocab_size: int = 51865) -> "WhisperConfig":
        return cls(dim=768, heads=12, enc_layers=12, dec_layers=12, vocab_size=vocab_size)

    @classmethod
    def medium(cls, vocab_size: int = 51865) -> "WhisperConfig":
        return cls(dim=1024, heads=16, enc_layers=24, dec_layers=24, vocab_size=vocab_size)


def sinusoids(length: int, channels: int) -> np.ndarray:
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


class _MHA(nn.Module):
    """Multi-head attention with the three entry modes of a TPU decode path:
    full (training / teacher-forced), precomputed-KV (cross attention at
    decode: K/V projected from the encoder ONCE via ``kv_proj``), and
    KV-cached causal self-attention (keys/values written in place with
    ``lax.dynamic_update_slice``, masked by absolute position)."""

    cfg: WhisperConfig
    causal: bool = False

    def setup(self):
        c = self.cfg
        hd = c.dim // c.heads
        self.q = nn.DenseGeneral((c.heads, hd), dtype=c.dtype)
        self.k = nn.DenseGeneral((c.heads, hd), use_bias=False, dtype=c.dtype)
        self.v = nn.DenseGeneral((c.heads, hd), dtype=c.dtype)
        self.out = nn.DenseGeneral(c.dim, axis=(-2, -1), dtype=c.dtype)

    def kv_proj(self, x):
        """Project K/V once (cross-attention precompute for decode)."""
        return self.k(x), self.v(x)

    def __call__(self, q_in, kv_in, return_weights: bool = False, cache=None, kv=None):
        c = self.cfg
        hd = c.dim // c.heads
        q = self.q(q_in)
        new_cache = None
        if kv is not None:
            k, v = kv
        else:
            k, v = self.k(kv_in), self.v(kv_in)
            if cache is not None:
                ck, cv, pos = cache
                k = jax.lax.dynamic_update_slice(ck, k, (0, pos, 0, 0))
                v = jax.lax.dynamic_update_slice(cv, v, (0, pos, 0, 0))
                new_cache = (k, v)
        att = jnp.einsum("...qhd,...khd->...hqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
        if self.causal:
            L, S = q_in.shape[-2], att.shape[-1]
            if cache is None:
                mask = jnp.tril(jnp.ones((L, S), bool), k=S - L)
            else:
                # queries sit at absolute positions pos..pos+L-1; the cache
                # holds keys for positions 0..S-1 (zeros beyond the write
                # head, masked off here)
                mask = jnp.arange(S)[None, :] <= (cache[2] + jnp.arange(L))[:, None]
            att = jnp.where(mask, att, jnp.finfo(att.dtype).min)
        w = jax.nn.softmax(att.astype(jnp.float32), axis=-1)
        o = jnp.einsum("...hqk,...khd->...qhd", w.astype(q.dtype), v)
        o = self.out(o)
        return o, (w if return_weights else None), new_cache


class _Block(nn.Module):
    cfg: WhisperConfig
    use_cross: bool = False
    use_causal: bool = False

    def setup(self):
        c = self.cfg
        self.ln_attn = nn.LayerNorm(dtype=jnp.float32)
        self.attn = _MHA(c, causal=self.use_causal)
        if self.use_cross:
            self.ln_cross = nn.LayerNorm(dtype=jnp.float32)
            self.cross = _MHA(c)
        self.ln_ffn = nn.LayerNorm(dtype=jnp.float32)
        self.fc1 = nn.Dense(c.dim * 4, dtype=c.dtype)
        self.fc2 = nn.Dense(c.dim, dtype=c.dtype)

    def __call__(self, x, enc=None, collect_cross: bool = False, cache=None, kv=None):
        hn = self.ln_attn(x)  # pre-norm: K/V project from the SAME normed h as q
        h, _, new_cache = self.attn(hn, hn, cache=cache)
        x = x + h
        cross_w = None
        if self.use_cross:
            hn = self.ln_cross(x)
            h, cross_w, _ = self.cross(hn, enc, return_weights=collect_cross, kv=kv)
            x = x + h
        hn = self.ln_ffn(x)
        h = self.fc1(hn)
        h = jax.nn.gelu(h, approximate=False)
        x = x + self.fc2(h)
        return x, cross_w, new_cache

    def cross_kv(self, enc):
        return self.cross.kv_proj(enc)


class WhisperEncoder(nn.Module):
    cfg: WhisperConfig

    @nn.compact
    def __call__(self, mel):  # mel: [T, n_mels]
        c = self.cfg
        # explicit (1,1) padding = torch Conv1d(padding=1): keeps ported
        # checkpoints sample-aligned (SAME pads (0,1) at stride 2)
        x = nn.Conv(c.dim, (3,), padding=((1, 1),), dtype=c.dtype, name="conv1")(mel)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(c.dim, (3,), strides=(2,), padding=((1, 1),), dtype=c.dtype, name="conv2")(x)
        x = jax.nn.gelu(x, approximate=False)
        T = x.shape[-2]
        x = x + jnp.asarray(sinusoids(c.n_audio_ctx, c.dim))[:T]
        for i in range(c.enc_layers):
            x, _, _ = _Block(c, name=f"block_{i}")(x)
        return nn.LayerNorm(dtype=jnp.float32, name="ln_post")(x)


class WhisperDecoder(nn.Module):
    cfg: WhisperConfig

    def setup(self):
        c = self.cfg
        self.tok_emb = nn.Embed(c.vocab_size, c.dim, dtype=c.dtype)
        self.pos_emb = self.param(
            "pos_emb", nn.initializers.normal(0.01), (c.n_text_ctx, c.dim), jnp.float32
        )
        for i in range(c.dec_layers):
            setattr(self, f"block_{i}", _Block(c, use_cross=True, use_causal=True))
        self.ln_post = nn.LayerNorm(dtype=jnp.float32)

    def _blocks(self):
        return [getattr(self, f"block_{i}") for i in range(self.cfg.dec_layers)]

    def _head(self, x):
        x = self.ln_post(x)
        return x @ self.tok_emb.embedding.T.astype(x.dtype)

    def __call__(self, tokens, enc, collect_cross: bool = False):
        c = self.cfg
        x = self.tok_emb(tokens) + self.pos_emb[: tokens.shape[-1]].astype(c.dtype)
        cross_ws = []
        for blk in self._blocks():
            x, w, _ = blk(x, enc, collect_cross=collect_cross)
            if collect_cross and w is not None:
                cross_ws.append(w)
        return self._head(x), cross_ws

    def cross_kv(self, enc):
        """Per-layer (K, V) of the cross attention, projected once per
        segment — the decode loop never touches the encoder again."""
        return [blk.cross_kv(enc) for blk in self._blocks()]

    def step(self, tokens, pos, caches, cross_kvs):
        """One decode step: ``tokens`` [B, L] at absolute positions
        pos..pos+L-1 against self-attention KV caches [B, S, heads, hd].
        Returns (logits [B, L, V], new caches, cross-attention row
        [B, L, F] — head- and layer-averaged, the DTW timestamp input)."""
        c = self.cfg
        L = tokens.shape[-1]
        pos_slice = jax.lax.dynamic_slice(self.pos_emb, (pos, 0), (L, c.dim))
        x = self.tok_emb(tokens) + pos_slice.astype(c.dtype)
        new_caches, rows = [], []
        for i, blk in enumerate(self._blocks()):
            x, w, nc = blk(
                x,
                collect_cross=True,
                cache=(caches[i][0], caches[i][1], pos),
                kv=cross_kvs[i],
            )
            new_caches.append(nc)
            rows.append(w.mean(axis=1))  # head-mean, [B, L, F]
        att = jnp.mean(jnp.stack(rows), axis=0)
        return self._head(x), new_caches, att


class WhisperModel(nn.Module):
    cfg: WhisperConfig

    def setup(self):
        self.encoder = WhisperEncoder(self.cfg)
        self.decoder = WhisperDecoder(self.cfg)

    def __call__(self, mel, tokens, collect_cross: bool = False):
        enc = self.encoder(mel)
        return self.decoder(tokens, enc, collect_cross)

    def encode(self, mel):
        return self.encoder(mel)

    def decode(self, tokens, enc, collect_cross: bool = False):
        return self.decoder(tokens, enc, collect_cross)

    def cross_kv(self, enc):
        return self.decoder.cross_kv(enc)

    def decode_step(self, tokens, pos, caches, cross_kvs):
        return self.decoder.step(tokens, pos, caches, cross_kvs)


def make_greedy_fn(model: WhisperModel, max_new: int, trie=None, lm_weight: float = 1.0, rep_limit: int = 2):
    """Single-jit greedy transcription (the models/llm.greedy_generate
    pattern applied to the encoder-decoder): mel → encoder → per-layer
    cross-K/V precompute → lax.while_loop of KV-cached single-token decoder
    steps. One executable launch per segment instead of one per token (the
    tunnel costs ~30 ms per launch; the reference's GPU hot loop is
    use_whisper_timestamped.py:150-170).

    With ``trie`` (align.lexicon_decode.TrieTables) the argmax is
    lexicon-constrained shallow fusion: a per-row trie-node state gathers
    the legal-continuation mask from the device-resident transition table,
    word-final nodes add their log-unigram bonus to the space/eot logit,
    and closing the same word more than ``rep_limit`` times consecutively
    is forbidden (whisper's compression-ratio reject, as a hard mask in a
    single greedy pass). One [B, 256] gather per step — invisible next to
    the decoder matmuls; the byte tokenizer's ids 0..255 ARE the trie's
    byte axis.

    Returns fn(params, mel [B, ·, n_mels], sot_id, eot_id, active [B] bool)
    → (tokens [B, max_new+1] with tokens[:, 0] = sot, att [B, max_new+1, F]):
    att[s] is the layer/head-averaged cross-attention of the query at
    position s — rows 1..n are the per-token DTW timestamp input.
    ``active=False`` rows (batch padding to the power-of-two bucket) are
    done before step 0 — without it a zero-mel pad row babbles to the token
    cap and every real row pays its steps (the loop exits on all-done).
    """
    cfg = model.cfg
    SPACE = 0x20
    if trie is not None:
        trans_t = jnp.asarray(trie.trans)
        can_end_t = jnp.asarray(trie.can_end)
        bonus_t = jnp.asarray(trie.end_bonus * np.float32(lm_weight))

    @jax.jit
    def run(params, mel, sot_id, eot_id, active):
        enc = model.apply(params, mel, method=WhisperModel.encode)
        cross_kvs = model.apply(params, enc, method=WhisperModel.cross_kv)
        B, F = enc.shape[0], enc.shape[-2]
        hd = cfg.dim // cfg.heads
        total = max_new + 1
        caches = [
            (
                jnp.zeros((B, total, cfg.heads, hd), cfg.dtype),
                jnp.zeros((B, total, cfg.heads, hd), cfg.dtype),
            )
            for _ in range(cfg.dec_layers)
        ]
        tokens = jnp.full((B, total), eot_id, jnp.int32)
        tokens = tokens.at[:, 0].set(sot_id)
        att = jnp.zeros((B, total, F), jnp.float32)
        # lexicon state: trie node per row, the last TWO closed words' end
        # nodes (word identity — equal words end at the same node), and a
        # consecutive-cycle count: straight repeats ("z z z") AND 2-cycles
        # ("mer merci mer merci") both babble on OOD audio
        cur0 = jnp.zeros((B,), jnp.int32)
        p1_0 = jnp.full((B,), -1, jnp.int32)
        p2_0 = jnp.full((B,), -2, jnp.int32)
        rep0 = jnp.zeros((B,), jnp.int32)

        def pick_next(logits, cur, p1, p2, rep, eot_id):
            lg = logits.astype(jnp.float32)
            if trie is None:
                return jnp.argmax(lg, axis=-1).astype(jnp.int32), cur, p1, p2, rep
            V = lg.shape[-1]
            cols = jnp.arange(V)[None, :]
            row = trans_t[cur]  # [B, 256]
            endable = can_end_t[cur]
            rep_block = ((cur == p1) & (rep >= rep_limit - 1)) | (
                (cur == p2) & (rep >= rep_limit)
            )
            space_ok = endable & ~rep_block
            eot_ok = endable | (cur == 0)
            mask = jnp.pad(row >= 0, ((0, 0), (0, V - 256)))
            mask = mask.at[:, SPACE].set(space_ok)
            mask = mask | ((cols == eot_id) & eot_ok[:, None])
            add = jnp.where(
                (cols == eot_id) | (cols == SPACE), bonus_t[cur][:, None], 0.0
            )
            nxt = jnp.argmax(jnp.where(mask, lg + add, -1e30), axis=-1).astype(jnp.int32)
            closes = nxt == SPACE
            new_cur = jnp.where(
                closes | (nxt == eot_id),
                0,
                trans_t[cur, jnp.clip(nxt, 0, 255)],
            )
            cyc = (cur == p1) | (cur == p2)
            rep = jnp.where(closes, jnp.where(cyc, rep + 1, 0), rep)
            p2 = jnp.where(closes, p1, p2)
            p1 = jnp.where(closes, cur, p1)
            return nxt, new_cur, p1, p2, rep

        def cond(state):
            step, _, _, _, done, *_ = state
            return (step < max_new) & ~jnp.all(done)

        def body(state):
            step, tokens, caches, att, done, cur, p1, p2, rep = state
            ids = jax.lax.dynamic_slice(tokens, (0, step), (B, 1))
            logits, caches, row = model.apply(
                params, ids, step, caches, cross_kvs, method=WhisperModel.decode_step
            )
            att = jax.lax.dynamic_update_slice(att, row.astype(jnp.float32), (0, step, 0))
            nxt, cur, p1, p2, rep = pick_next(logits[:, -1], cur, p1, p2, rep, eot_id)
            nxt = jnp.where(done, eot_id, nxt)
            done = done | (nxt == eot_id)
            tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, step + 1))
            return step + 1, tokens, caches, att, done, cur, p1, p2, rep

        state = (0, tokens, caches, att, ~active, cur0, p1_0, p2_0, rep0)
        _, tokens, caches, att, _, _, _, _, _ = jax.lax.while_loop(cond, body, state)
        # One extra decode step for the query at position max_new: rows that
        # hit the cap without emitting eot have all max_new generated tokens
        # as text, and the last one's attention row (row max_new) is never
        # written by the loop — its DTW input would be all-zero. Rows that
        # finished early never read this row (their n < max_new), so the
        # garbage-cache case is harmless.
        ids = jax.lax.dynamic_slice(tokens, (0, max_new), (B, 1))
        _, _, row = model.apply(
            params, ids, max_new, caches, cross_kvs, method=WhisperModel.decode_step
        )
        att = jax.lax.dynamic_update_slice(att, row.astype(jnp.float32), (0, max_new, 0))
        return tokens, att

    return run


def _attention_spans_device(att, n, fr, max_rows: int):
    """Traced: cross-attention rows → DTW spans, all on device.

    att [B, R, F] (row 1+t is text token t's attention), n [B] real token
    counts, fr [B] real encoder frames. Matches the host path exactly
    (per-token normalisation over real frames, then the monotonic-partition
    DP with the same tie rule), but neither the attention tensor nor the DP
    matrix ever leaves the device — only [B, max_rows, 2] span indices do.
    """
    from ..ops.dtw import monotonic_partition_spans_batched

    F = att.shape[-1]
    w = att[:, 1 : 1 + max_rows, :]  # [B, max_rows, F]
    fmask = jnp.arange(F)[None, None, :] < fr[:, None, None]
    rmask = jnp.arange(max_rows)[None, :, None] < n[:, None, None]
    wm = w * fmask
    wn = wm / jnp.maximum(wm.sum(axis=-1, keepdims=True), 1e-9)
    cost = -(wn * rmask)
    return monotonic_partition_spans_batched(cost, n, fr)


def make_greedy_spans_fn(
    model: WhisperModel, max_new: int, trie=None, lm_weight: float = 1.0, rep_limit: int = 2
):
    """The production alignment launch: greedy decode (make_greedy_fn) +
    eot scan + cross-attention DTW + device backtrack fused into ONE
    jitted program. fn(params, mel, sot, eot, fr [B] int32, active [B]
    bool) → (tokens [B, max_new+1], n [B] token counts, spans
    [B, max_new, 2] frame indices). The per-corpus readback is a few KB of
    tokens/spans instead of the [B, max_new+1, F] float32 attention tensor
    plus the [B, L+1, F+1] DP matrix (MBs over the ~40 MB/s tunnel).
    ``trie``/``lm_weight``/``rep_limit`` pass through to the
    lexicon-constrained greedy."""
    greedy = make_greedy_fn(model, max_new, trie=trie, lm_weight=lm_weight, rep_limit=rep_limit)

    @jax.jit
    def run(params, mel, sot_id, eot_id, fr, active):
        tokens, att = greedy(params, mel, sot_id, eot_id, active)
        is_eot = tokens[:, 1:] == eot_id  # [B, max_new]
        n = jnp.where(is_eot.any(axis=1), jnp.argmax(is_eot, axis=1), max_new).astype(jnp.int32)
        spans = _attention_spans_device(att, n, fr.astype(jnp.int32), max_new)
        return tokens, n, spans

    return run


# ---------------------------------------------------------------------------
# cross-attention DTW timestamps (whisper-timestamped technique)
# ---------------------------------------------------------------------------


def token_times_from_cross_attention(
    cross_ws: list[jnp.ndarray], n_frames: int, frame_dt: float = FRAME_DT
) -> np.ndarray:
    """cross_ws: per-layer [..., heads, tokens, frames] weights →
    [tokens, 2] start/end seconds via DTW over the head-averaged,
    per-token-normalised attention."""
    w = np.mean([np.asarray(x, np.float32) for x in cross_ws], axis=0)
    while w.ndim > 3:
        w = w.mean(axis=0)
    w = w.mean(axis=0)  # [tokens, frames]
    w = w[:, :n_frames]
    return spans_from_attention(w, frame_dt)


def spans_from_attention(w: np.ndarray, frame_dt: float = FRAME_DT) -> np.ndarray:
    """[tokens, frames] attention → [tokens, 2] start/end seconds.

    Normalises per token, then runs the monotonic-partition DP on device
    (ops.dtw.monotonic_partition_costs — associative-scan rows, replacing
    the former O(tokens×frames) Python double loop) and backtracks the
    O(L+F) path on host. The token axis pads to a 16-bucket so XLA compiles
    one program per frame width; D's row-prefix property makes the padded
    rows inert."""
    from ..ops.dtw import monotonic_partition_backtrack, monotonic_partition_costs

    w = np.asarray(w, np.float32)
    w = w / np.maximum(w.sum(axis=-1, keepdims=True), 1e-9)
    n_tok, n_fr = w.shape
    pad_l = ((n_tok + 15) // 16) * 16
    pad_f = _frame_bucket(n_fr)
    cost = np.zeros((pad_l, pad_f), np.float32)
    cost[:n_tok, :n_fr] = -w  # maximise attention ≡ minimise cost
    D = np.asarray(monotonic_partition_costs(jnp.asarray(cost)))
    spans = monotonic_partition_backtrack(D[: n_tok + 1, : n_fr + 1])
    return spans * frame_dt


def _frame_bucket(n_fr: int, step: int = 256) -> int:
    """Frame-axis pad bucket for the partition DP: D's column prefix is
    exact (zeros in pad columns never reach real columns), so padding to a
    coarse grid is free numerically and collapses the per-corpus frame
    widths onto a handful of compiled programs — without it every distinct
    (batch, max-frame) pair costs a fresh XLA compile (minutes on this
    host)."""
    return max(step, ((n_fr + step - 1) // step) * step)


def spans_from_attention_batch(
    ws: list[np.ndarray], frame_dt: float = FRAME_DT
) -> list[np.ndarray]:
    """Batched ``spans_from_attention``: every matrix pads to the common
    (token-bucket, frame) envelope and the DP runs as ONE vmapped device
    program; backtracks stay host-side per item. Both DP prefixes (rows
    AND columns) are exact, so each item's result equals its solo run."""
    from ..ops.dtw import monotonic_partition_backtrack, monotonic_partition_costs_batched

    if not ws:
        return []
    ws = [np.asarray(w, np.float32) for w in ws]
    # every axis pads to a coarse bucket (tokens: 16s, frames: 256s,
    # batch: pow2) so per-corpus shape variation reuses a handful of
    # compiled DP programs — both DP prefixes and zero-cost pad rows are
    # exact, so the padding never changes any real item's spans
    pad_l = max(((w.shape[0] + 15) // 16) * 16 for w in ws)
    pad_f = _frame_bucket(max(w.shape[1] for w in ws))
    pad_b = 1 << max(len(ws) - 1, 1).bit_length()
    cost = np.zeros((pad_b, pad_l, pad_f), np.float32)
    for i, w in enumerate(ws):
        w = w / np.maximum(w.sum(axis=-1, keepdims=True), 1e-9)
        cost[i, : w.shape[0], : w.shape[1]] = -w
    import jax.numpy as _jnp

    D = np.asarray(monotonic_partition_costs_batched(_jnp.asarray(cost)))
    return [
        monotonic_partition_backtrack(D[i, : w.shape[0] + 1, : w.shape[1] + 1]) * frame_dt
        for i, w in enumerate(ws)
    ]


def group_word_times(tokens: list[str], token_spans: np.ndarray) -> list[AlignedWord]:
    """Whitespace-boundary grouping of subword tokens into words."""
    words: list[AlignedWord] = []
    cur = ""
    t0 = None
    t1 = 0.0
    for tok, (s, e) in zip(tokens, token_spans):
        starts_word = tok.startswith(" ") or not cur
        if starts_word and cur:
            words.append(AlignedWord(t0, t1, cur.strip()))
            cur = ""
            t0 = None
        if t0 is None:
            t0 = float(s)
        cur += tok
        t1 = float(e)
    if cur.strip():
        words.append(AlignedWord(t0 or 0.0, t1, cur.strip()))
    return words


# ---------------------------------------------------------------------------
# audio gates (use_whisper_timestamped.py:197-261)
# ---------------------------------------------------------------------------


def check_audio_content(samples: np.ndarray, int_scale: float = 32768.0) -> tuple[bool, str]:
    data = np.asarray(samples, np.float32) * int_scale
    if data.size == 0:
        return False, "empty audio"
    rms = float(np.sqrt(np.mean(np.square(data))))
    silence_ratio = 1.0 - float(np.sum(np.abs(data) > 500) / data.size)
    if silence_ratio > 0.95:
        return False, f"File mainly contains silence ({silence_ratio:.2f})"
    if rms < 100:
        return False, f"Very low audio level (RMS={rms:.0f})"
    return True, "Audio valide"


EMPTY_TEXT = "..."
DISFLUENCY_MARK = "[*]"  # whisper-timestamped's pause/disfluency marker


def vad_speech_regions(
    audio: Audio,
    min_silence_ms: int = 400,
    silence_thresh_db: float = -40.0,
    keep_silence_ms: int = 100,
) -> list[tuple[float, float]]:
    """Energy-based VAD: speech spans in seconds (the auditok stand-in the
    reference passes to whisper.transcribe, use_whisper_timestamped.py:152).
    Raises ValueError mentioning ``max_silence`` on audio too short to
    window — the exact failure the reference's no-VAD retry catches
    (:163-170, auditok raises when duration < max_silence)."""
    from ..ops.energy import split_on_silence_ranges

    a = audio.to_mono()
    x = np.asarray(a.samples, np.float32)
    dur_ms = len(x) * 1000.0 / a.rate
    if dur_ms < 2 * min_silence_ms:
        raise ValueError(f"max_silence ({min_silence_ms} ms) is larger than audio duration")
    ranges = split_on_silence_ranges(x, a.rate, min_silence_ms, silence_thresh_db, keep_silence_ms)
    return [(s / 1000.0, e / 1000.0) for s, e in ranges]


def mark_disfluencies(
    words: list[AlignedWord],
    speech_regions: list[tuple[float, float]],
    min_gap_s: float = 0.3,
) -> list[AlignedWord]:
    """Insert ``[*]`` entries in word-stream gaps that fall inside detected
    speech (the model heard something but aligned no word there) — the
    behavioral equivalent of whisper-timestamped's detect_disfluencies
    (use_whisper_timestamped.py:154; markers surface in word texts and are
    replaced with " " in the TextGrid, :375)."""

    def in_speech(t0: float, t1: float) -> bool:
        mid = 0.5 * (t0 + t1)
        return any(s <= mid <= e for s, e in speech_regions)

    out: list[AlignedWord] = []
    prev_end = speech_regions[0][0] if speech_regions else 0.0
    for w in sorted(words, key=lambda w: w.start):
        gap = w.start - prev_end
        if gap >= min_gap_s and in_speech(prev_end, w.start):
            out.append(AlignedWord(prev_end, w.start, DISFLUENCY_MARK))
        out.append(w)
        prev_end = max(prev_end, w.end)
    return out


def empty_result() -> dict:
    """The reference's placeholder result shape
    (use_whisper_timestamped.py:244-261)."""
    return {
        "text": EMPTY_TEXT,
        "segments": [
            {
                "id": 0,
                "start": 0.0,
                "end": 1.0,
                "text": EMPTY_TEXT,
                "words": [{"start": 0.0, "end": 1.0, "text": EMPTY_TEXT, "confidence": 0.0}],
            }
        ],
    }


class WhisperAligner:
    """Aligner-protocol wrapper: transcribe (greedy) + timestamp via
    cross-attention DTW. Requires trained/ported weights to produce real
    text; the gates and placeholder semantics work regardless."""

    def __init__(
        self,
        cfg: WhisperConfig | None = None,
        params=None,
        tokenizer=None,
        weights_path=None,
        use_vad: bool = True,
        detect_disfluencies: bool = True,
        lexicon_decode: bool = True,
        lm_weight: float = 1.0,
        rep_limit: int = 2,
    ):
        if cfg is None and params is None and tokenizer is None and weights_path is None:
            # zero-config construction → the packaged hermetically-pretrained
            # checkpoint (align.pretrain_whisper), the out-of-the-box
            # behavior of the reference's model download
            # (use_whisper_timestamped.py:92-104) without the network
            packaged = Path(__file__).parent / "pretrained" / "whisper_fr_synth"
            if (packaged / "weights.npz").exists():
                import json

                from ..models.bpe_tokenizer import load_whisper_tokenizer

                d = json.loads((packaged / "config.json").read_text(encoding="utf-8"))
                d.pop("dtype", None)
                cfg = WhisperConfig(**d)
                tokenizer = load_whisper_tokenizer(packaged)
                weights_path = packaged / "weights.npz"
        self.cfg = cfg or WhisperConfig.tiny()
        self.model = WhisperModel(self.cfg)
        self.tokenizer = tokenizer
        if weights_path is not None:
            from .ctc_aligner import load_params

            params = load_params(weights_path)
        self.params = params
        # the reference's transcription defaults: vad="auditok",
        # detect_disfluencies=True (use_whisper_timestamped.py:150-156)
        self.use_vad = use_vad
        self.detect_disfluencies = detect_disfluencies
        # lexicon-constrained free decode (align.lexicon_decode): only
        # meaningful for the byte-level hermetic tokenizer, where token ids
        # 0..255 ARE the trie's byte axis; ported published checkpoints
        # (real BPE merges) carry their own trained LM and decode free
        self.lexicon_decode = lexicon_decode and self._byte_level_tokenizer()
        self.lm_weight = lm_weight
        self.rep_limit = rep_limit
        # jitted programs live in the module-level _TRACE_MEMO (keyed by
        # config) so fresh aligner instances skip re-tracing

    @classmethod
    def from_pretrained(cls, path, **kwargs) -> "WhisperAligner":
        """Load a deployed checkpoint directory: ``config.json`` (geometry),
        ``weights.npz`` (ported via models.port_weights.whisper_to_flax or
        trained here), and any supported tokenizer artifact
        (tokenizer.json / vocab.json+merges.txt / *.tiktoken / *.bpe.json).
        The out-of-the-box experience of the reference's model download
        (use_whisper_timestamped.py:92-104), minus the network."""
        import json
        from pathlib import Path

        from ..models.bpe_tokenizer import load_whisper_tokenizer
        from .ctc_aligner import load_params

        p = Path(path)
        cfg_file = p / "config.json"
        if cfg_file.exists():
            d = json.loads(cfg_file.read_text(encoding="utf-8"))
            d.pop("dtype", None)
            cfg = WhisperConfig(**d)
        else:
            cfg = WhisperConfig.base()
        tokenizer = load_whisper_tokenizer(p)
        params = load_params(p / "weights.npz")
        return cls(cfg, params=params, tokenizer=tokenizer, **kwargs)

    def save_pretrained(self, path) -> None:
        import dataclasses
        import json
        from pathlib import Path

        from .ctc_aligner import save_params

        p = Path(path)
        p.mkdir(parents=True, exist_ok=True)
        d = dataclasses.asdict(self.cfg)
        d.pop("dtype", None)
        (p / "config.json").write_text(json.dumps(d), encoding="utf-8")
        save_params(self.params, p / "weights.npz")
        if hasattr(self.tokenizer, "specials"):  # ByteLevelBPE artifact
            self.tokenizer.save(p / "tokenizer.bpe.json")
        elif hasattr(self.tokenizer, "save"):  # WordPiece vocab json
            self.tokenizer.save(p / "wordpiece_vocab.json")

    def _byte_level_tokenizer(self) -> bool:
        """True for the hermetic byte tokenizer (ids 0..255 = UTF-8 bytes,
        no merges) — the layout the lexicon trie indexes by."""
        tok = self.tokenizer
        return (
            tok is not None
            and getattr(tok, "merges", None) == {}
            and len(getattr(tok, "vocab", ())) == 256
        )

    def _audio_window(self, audio: Audio) -> np.ndarray:
        """Host-side prep: mono, model rate, zero-padded to exactly the
        model window (n_audio_ctx·2 mel frames worth of samples)."""
        from ..utils.wavio import resample

        audio = audio.to_mono()
        if audio.rate != SAMPLE_RATE:
            audio = resample(audio, SAMPLE_RATE)
        x = np.asarray(audio.samples, np.float32)
        want = self.cfg.n_audio_ctx * 2 * HOP
        if x.shape[0] < want:
            x = np.pad(x, (0, want - x.shape[0]))
        return x[:want]

    def _mel_batch(self, xs: np.ndarray) -> jnp.ndarray:
        """[B, window] samples → [B, max_mel, n_mels] log-mels in ONE
        launch, result left ON DEVICE (the decode programs consume it
        directly — no host round trip per clip)."""
        max_mel = self.cfg.n_audio_ctx * 2
        n_mels = self.cfg.n_mels

        def build():
            @jax.jit
            def run(batch):
                mels = jax.vmap(
                    lambda x: log_mel(x, SAMPLE_RATE, n_fft=400, hop_length=HOP, n_mels=n_mels)
                )(batch)
                return mels[:, :max_mel]

            return run

        fn = _memo_fn(("mel", max_mel, n_mels), build)
        return fn(jnp.asarray(xs))

    def features(self, audio: Audio) -> jnp.ndarray:
        return self._mel_batch(self._audio_window(audio)[None])[0]

    def _stack_windows(self, jobs: list[dict]) -> jnp.ndarray:
        """[Bp, window] device array from per-job windows, padded to the
        power-of-two batch bucket. Windows already device_put by
        align_batch (j["xd"]) stack on device without re-upload; direct
        callers (the single-clip convenience paths) fall back to a host
        stack+upload."""
        B = len(jobs)
        Bp = 1 << max(B - 1, 1).bit_length()
        if all("xd" in j for j in jobs):
            stacked = jnp.stack([j["xd"] for j in jobs])
            if Bp != B:
                stacked = jnp.concatenate(
                    [stacked, jnp.zeros((Bp - B, stacked.shape[1]), jnp.float32)], axis=0
                )
            return stacked
        xs = np.stack([self._audio_window(j["audio"]) for j in jobs])
        if Bp != B:
            xs = np.pad(xs, ((0, Bp - B), (0, 0)))
        return jnp.asarray(xs)

    def align(self, audio: Audio, transcript: str | None = None) -> TextGrid:
        return self.align_batch([audio], [transcript])[0]

    def align_batch(
        self, audios: list[Audio], transcripts: list[str | None] | None = None
    ) -> list[TextGrid]:
        """Batched alignment: every clip's speech regions are planned on
        host, then ALL transcript-free sub-clips decode in ONE greedy
        launch (batch axis; padded to a power-of-two) and their
        cross-attention DTWs run in ONE batched device program — the
        per-launch tunnel floor (~30 ms) amortizes across the corpus
        instead of repeating per segment. Teacher-forced sub-clips (known
        transcript) are one decode launch each. Semantics per clip are
        identical to ``align``."""
        transcripts = list(transcripts) if transcripts is not None else [None] * len(audios)
        if len(transcripts) != len(audios):
            raise ValueError(
                f"align_batch: {len(audios)} audios but {len(transcripts)} transcripts"
            )
        plans: list[dict] = []
        jobs: list[dict] = []
        for idx, (audio, transcript) in enumerate(zip(audios, transcripts)):
            a = audio.to_mono()
            ok, _reason = check_audio_content(np.asarray(a.samples))
            if not ok:
                # gate precedes the weights requirement: the "..."
                # placeholder works without a model (reference parity)
                plans.append({"empty": True, "dur": a.duration_seconds})
                continue
            if self.params is None or self.tokenizer is None:
                raise ValueError("WhisperAligner needs weights + tokenizer")
            regions, clip_jobs = self._plan_jobs(a, transcript)
            for j in clip_jobs:
                j["clip"] = idx
                # start this window's h2d NOW: transfers stream in the
                # background on this runtime, so the upload of clip k rides
                # under the VAD/resample host work of clips k+1… — the
                # blocking stack-and-upload used to cost ~0.8 s per corpus
                # batch (tools/profile_whisper.py: mel 512 ms from host vs
                # 58 ms from device at the corpus batch shape)
                j["xd"] = jax.device_put(self._audio_window(j["audio"]))
            jobs.extend(clip_jobs)
            plans.append({"empty": False, "dur": a.duration_seconds, "regions": regions})

        free = [j for j in jobs if j["transcript"] is None]
        forced = [j for j in jobs if j["transcript"] is not None]
        if free:
            self._run_free_jobs(free)
        if forced:
            self._run_forced_jobs(forced)

        by_clip: dict[int, list[dict]] = {}
        for j in jobs:
            by_clip.setdefault(j["clip"], []).append(j)

        out: list[TextGrid] = []
        for idx, plan in enumerate(plans):
            dur = plan["dur"]
            if plan["empty"]:
                out.append(
                    words_to_textgrid([AlignedWord(0.0, min(1.0, dur), EMPTY_TEXT)], dur)
                )
                continue
            words: list[AlignedWord] = []
            for j in by_clip.get(idx, ()):
                sub_dur = j["audio"].duration_seconds
                for w in j.get("words", []):
                    s = min(w.start, sub_dur) + j["t0"]
                    e = min(w.end, sub_dur) + j["t0"]
                    words.append(AlignedWord(s, e, w.word))
            regions = plan["regions"]
            if self.detect_disfluencies:
                words = mark_disfluencies(words, regions if regions else [(0.0, dur)])
            # the reference's TextGrid replaces the marker with " "
            # (use_whisper_timestamped.py:375) so downstream sees a pause:
            # pure markers become silence gaps in our ""-silence convention
            words = [
                AlignedWord(w.start, w.end, w.word.replace(DISFLUENCY_MARK, " ").strip())
                for w in words
            ]
            out.append(words_to_textgrid([w for w in words if w.word], dur))
        return out

    # -- planning (host) ---------------------------------------------------

    def _plan_jobs(self, audio: Audio, transcript: str | None):
        """(regions, jobs): VAD speech regions with transcript words
        apportioned by duration (use_whisper_timestamped.py:152 semantics),
        then >window chunking — each job is a ≤window sub-clip with an
        absolute offset ``t0`` and an optional transcript."""
        regions: list[tuple[float, float]] | None = None
        if self.use_vad:
            try:
                regions = vad_speech_regions(audio)
            except ValueError as e:
                # auditok-parity failure on short audio → retry without VAD
                # (use_whisper_timestamped.py:163-170)
                if "max_silence" not in str(e):
                    raise
                regions = None
        jobs: list[dict] = []
        if regions:
            words_all = transcript.split() if transcript is not None else None
            total_speech = sum(e - s for s, e in regions) or 1e-9
            wi = 0
            for k, (t0, t1) in enumerate(regions):
                sub = audio.slice_ms(t0 * 1000, t1 * 1000)
                if words_all is not None:
                    if k < len(regions) - 1:
                        share = int(round(len(words_all) * (t1 - t0) / total_speech))
                        chunk = words_all[wi : wi + max(share, 0)]
                    else:
                        chunk = words_all[wi:]
                    wi += len(chunk)
                    if not chunk:
                        continue
                    sub_tr = " ".join(chunk)
                else:
                    sub_tr = None
                jobs.extend(self._window_chunks(sub, sub_tr, t0))
        else:
            jobs = self._window_chunks(audio, transcript, 0.0)
        return regions, jobs

    def _window_chunks(self, audio: Audio, transcript: str | None, base_t0: float) -> list[dict]:
        """Split audio longer than the model window into ≤window jobs with
        word budgets apportioned by duration (the reference delegates this
        to whisper-timestamped's chunking)."""
        window_s = self.cfg.n_audio_ctx * FRAME_DT
        dur = audio.duration_seconds
        if dur <= window_s:
            return [{"t0": base_t0, "audio": audio, "transcript": transcript}]
        words_all = transcript.split() if transcript is not None else None
        out: list[dict] = []
        n_chunks = int(np.ceil(dur / window_s))
        wi = 0
        for c in range(n_chunks):
            t0 = c * window_s
            sub = audio.slice_ms(t0 * 1000, min((c + 1) * window_s, dur) * 1000)
            if words_all is not None:
                share = int(round(len(words_all) * sub.duration_seconds / dur))
                chunk_words = words_all[wi : wi + max(share, 0)] if c < n_chunks - 1 else words_all[wi:]
                wi += len(chunk_words)
                sub_tr = " ".join(chunk_words)
                if not sub_tr:
                    continue
            else:
                sub_tr = None
            out.extend(self._window_chunks(sub, sub_tr, base_t0 + t0))
        return out

    # -- execution (device) ------------------------------------------------

    def _run_free_jobs(self, free: list[dict], max_tokens: int = 128) -> None:
        """Transcript-free jobs: ONE fused device launch over the stacked
        mel batch (padded to a power-of-two batch so distinct corpus sizes
        reuse a handful of compiled programs) doing greedy decode +
        cross-attention DTW + backtrack (make_greedy_spans_fn); only
        KB-sized tokens/spans come back. Fills job["words"] in place."""
        max_new = min(max_tokens, self.cfg.n_text_ctx - 1)
        xs = self._stack_windows(free)
        B = len(free)
        Bp = xs.shape[0]
        mels = self._mel_batch(xs)  # one launch; stays on device
        trie = None
        if self.lexicon_decode:
            from .lexicon_decode import default_trie

            trie = default_trie()
        fn = _memo_fn(
            ("spans", self.cfg, max_new, self.lexicon_decode, self.lm_weight, self.rep_limit),
            lambda: make_greedy_spans_fn(
                self.model, max_new, trie=trie, lm_weight=self.lm_weight, rep_limit=self.rep_limit
            ),
        )
        # REAL encoder frames per clip (see _teacher_forced_words): the DP
        # is restricted to them on device; pad rows get 1 and are done
        # before step 0 (`active`) so they never gate the loop's early exit
        fr = np.ones(Bp, np.int32)
        active = np.zeros(Bp, bool)
        active[:B] = True
        for i, j in enumerate(free):
            fr[i] = max(1, int(np.ceil(j["audio"].duration_seconds / FRAME_DT)))
        fr = np.minimum(fr, self.cfg.n_audio_ctx)
        tokens, n, spans = fn(
            self.params,
            mels,
            self.tokenizer.cls_id,
            self.tokenizer.sep_id,
            jnp.asarray(fr),
            jnp.asarray(active),
        )
        tokens = np.asarray(tokens)[:B]
        n = np.asarray(n)[:B]
        spans = np.asarray(spans)[:B]
        for i, j in enumerate(free):
            ni = int(n[i])
            if ni == 0:
                j["words"] = []
                continue
            pieces = self.tokenizer.pieces_with_boundaries([int(t) for t in tokens[i, 1 : ni + 1]])
            j["words"] = group_word_times(pieces, spans[i, :ni] * FRAME_DT)

    def _run_forced_jobs(self, forced: list[dict]) -> None:
        """Teacher-forced jobs (known transcripts): ONE batched
        encode+decode launch over the stacked mels and token rows (padded
        to a 16-bucket; causal self-attention makes pad rows inert for the
        sliced real rows), then ONE batched DTW. Fills job["words"]."""
        tok_rows = []
        for j in forced:
            token_ids = self.tokenizer.encode(j["transcript"])[1:-1]
            j["_token_ids"] = token_ids
            tok_rows.append([self.tokenizer.cls_id] + token_ids)
        L = max(len(r) for r in tok_rows)
        Lb = min(((L + 15) // 16) * 16, self.cfg.n_text_ctx)
        ids = np.full((len(forced), Lb), self.tokenizer.sep_id, np.int32)
        for i, r in enumerate(tok_rows):
            ids[i, : min(len(r), Lb)] = r[:Lb]
        xs = self._stack_windows(forced)
        B = len(forced)
        Bp = xs.shape[0]
        if Bp != B:
            ids = np.pad(ids, ((0, Bp - B), (0, 0)), constant_values=self.tokenizer.sep_id)
        mels = self._mel_batch(xs)

        def build():
            model = self.model

            @jax.jit
            def run(params, mel, toks, n_tok, fr):
                enc = model.apply(params, mel, method=WhisperModel.encode)
                _, cross = model.apply(params, toks, enc, True, method=WhisperModel.decode)
                # layer- and head-averaged cross attention rows [B, L, F],
                # then DTW + backtrack on device — only spans come back
                att = jnp.mean(jnp.stack([w.mean(axis=1) for w in cross]), axis=0)
                return _attention_spans_device(att, n_tok, fr, att.shape[1] - 1)

            return run

        fn = _memo_fn(("forced", self.cfg), build)
        # REAL token counts and encoder frames per clip: the DP is
        # restricted to them on device (attention mass in the mel pad would
        # otherwise place words past the audio end — they then clamp to
        # zero-width spans and vanish from the TextGrid)
        n_tok = np.zeros(Bp, np.int32)
        fr = np.ones(Bp, np.int32)
        for i, j in enumerate(forced):
            n_tok[i] = min(len(j["_token_ids"]), Lb - 1)
            fr[i] = max(1, int(np.ceil(j["audio"].duration_seconds / FRAME_DT)))
        fr = np.minimum(fr, self.cfg.n_audio_ctx)
        spans_all = np.asarray(
            fn(self.params, mels, jnp.asarray(ids), jnp.asarray(n_tok), jnp.asarray(fr))
        )[:B]
        for i, j in enumerate(forced):
            # per-token surface strings with a leading space marking word
            # starts (NOT decode([t]): that strips the WordPiece "##" marker
            # and would split multi-piece words); both tokenizer families
            # implement this
            nt = int(n_tok[i])
            pieces = self.tokenizer.pieces_with_boundaries(j["_token_ids"][:nt])
            j["words"] = group_word_times(pieces, spans_all[i, :nt] * FRAME_DT)

    def _teacher_forced_words(self, audio: Audio, transcript: str) -> list[AlignedWord]:
        """Single-clip convenience wrapper over the batched forced path."""
        job = {"audio": audio, "transcript": transcript}
        self._run_forced_jobs([job])
        return job["words"]

    def _parse_greedy_output(
        self, toks: np.ndarray, att: np.ndarray, max_new: int
    ) -> tuple[list[int], np.ndarray]:
        """One clip's make_greedy_fn output row → (text token ids, their
        cross-attention rows [n, F]). Shared by the single-clip and batched
        paths so the eot-scan/att-slicing semantics cannot drift."""
        toks = np.asarray(toks)
        eots = np.nonzero(toks[1:] == self.tokenizer.sep_id)[0]
        n = int(eots[0]) if eots.size else max_new
        return [int(t) for t in toks[1 : n + 1]], np.asarray(att[1 : n + 1])

    def _greedy_tokens(self, audio: Audio, max_tokens: int = 128) -> tuple[list[int], np.ndarray]:
        """One device launch: greedy KV-cache transcription (make_greedy_fn)
        → (text token ids, their cross-attention rows [n, F])."""
        if self.params is None or self.tokenizer is None:
            raise ValueError("WhisperAligner needs weights + tokenizer")
        max_new = min(max_tokens, self.cfg.n_text_ctx - 1)
        fn = _memo_fn(("greedy", self.cfg, max_new), lambda: make_greedy_fn(self.model, max_new))
        mel = self.features(audio)
        tokens, att = fn(
            self.params,
            mel[None],
            self.tokenizer.cls_id,
            self.tokenizer.sep_id,
            jnp.ones((1,), bool),
        )
        return self._parse_greedy_output(np.asarray(tokens[0]), np.asarray(att[0]), max_new)

    def transcribe(self, audio: Audio, max_tokens: int = 128) -> str:
        token_ids, _ = self._greedy_tokens(audio, max_tokens)
        return self.tokenizer.decode(token_ids)
