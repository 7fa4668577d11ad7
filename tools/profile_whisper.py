"""On-chip stage profile of the whisper alignment launch (VERDICT r5 #3).

Times, each as its own jitted program with scalar-forced readback (this
runtime does not force unconsumed results — CLAUDE.md):

  mel       batched log-mel front-end
  enc       encoder + per-layer cross-K/V precompute
  step      ONE decoder KV-cache step, amortized via lax.fori_loop(K)
  greedy    the full fused greedy decode (while_loop, data-dependent exit)
  spans     cross-attention DTW + device backtrack
  full      make_greedy_spans_fn (the production launch)

Stage numbers are latency, not additive shares (the fused program
interleaves independent subgraphs); per-step × steps vs `greedy` is the
decision-grade comparison for the decode loop itself.

Run:  python tools/profile_whisper.py [B] [repeat]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from prosody_control_french_tts_tpu.align.whisper_jax import (
    WhisperAligner,
    WhisperModel,
    make_greedy_fn,
    make_greedy_spans_fn,
    _attention_spans_device,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def timed(label, fn, *args, reps=REPS):
    # warm (compile), then median of reps; force with a scalar read
    out = fn(*args)
    _force(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"{label:>8}: {med*1000:8.2f} ms  (min {min(ts)*1000:.2f})")
    return med


def _force(out):
    leaves = jax.tree.leaves(out)
    x = leaves[0]
    float(np.asarray(x.reshape(-1)[0]))


def main():
    al = WhisperAligner()
    cfg = al.cfg
    print(f"packaged cfg: dim {cfg.dim}, layers {cfg.enc_layers}+{cfg.dec_layers}, "
          f"F {cfg.n_audio_ctx}, vocab {cfg.vocab_size}, B={B}")
    rng = np.random.default_rng(0)
    window = cfg.n_audio_ctx * 2 * 160
    xs = rng.standard_normal((B, window)).astype(np.float32) * 0.1
    max_new = min(128, cfg.n_text_ctx - 1)

    mel = al._mel_batch(xs)
    timed("mel", al._mel_batch, xs)

    model = al.model
    enc_fn = jax.jit(
        lambda p, m: model.apply(
            p, model.apply(p, m, method=WhisperModel.encode), method=WhisperModel.cross_kv
        )
    )
    timed("enc+kv", enc_fn, al.params, mel)

    # one decode step amortized: K chained steps inside one jit
    K = 32

    @jax.jit
    def steps_k(params, mel):
        enc = model.apply(params, mel, method=WhisperModel.encode)
        kvs = model.apply(params, enc, method=WhisperModel.cross_kv)
        hd = cfg.dim // cfg.heads
        total = max_new + 1
        caches = [
            (jnp.zeros((B, total, cfg.heads, hd), cfg.dtype),
             jnp.zeros((B, total, cfg.heads, hd), cfg.dtype))
            for _ in range(cfg.dec_layers)
        ]

        def body(i, st):
            tok, caches, acc = st
            logits, caches, row = model.apply(
                al.params, tok, i, caches, kvs, method=WhisperModel.decode_step
            )
            # multiplicative perturbation: argmax depends on logits so steps chain
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None] % cfg.vocab_size
            return tok, caches, acc * 1.000001 + row.sum()

        tok0 = jnp.zeros((B, 1), jnp.int32)
        _, _, acc = jax.lax.fori_loop(0, K, body, (tok0, caches, jnp.float32(0)))
        return acc

    t_enc = timed("enc(ref)", enc_fn, al.params, mel)
    t_k = timed(f"{K}steps", steps_k, al.params, mel)
    print(f"  -> per decode step ≈ {(t_k - t_enc) / K * 1000:.3f} ms")

    greedy = make_greedy_fn(model, max_new)
    sot, eot = al.tokenizer.cls_id, al.tokenizer.sep_id
    act = jnp.ones((B,), bool)
    timed("greedy", lambda m: greedy(al.params, m, sot, eot, act), mel)

    att = jnp.asarray(rng.random((B, max_new + 1, cfg.n_audio_ctx), np.float32))
    n = jnp.full((B,), max_new, jnp.int32)
    fr = jnp.full((B,), cfg.n_audio_ctx, jnp.int32)
    spans_fn = jax.jit(lambda a, n, f: _attention_spans_device(a, n, f, max_new))
    timed("spans", spans_fn, att, n, fr)

    full = make_greedy_spans_fn(model, max_new)
    timed("full", lambda m: full(al.params, m, sot, eot, fr, act), mel)


if __name__ == "__main__":
    main()
