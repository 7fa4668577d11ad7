"""Pretraining recipe for the packaged out-of-the-box CTC aligner.

The reference's aligner backends work without per-project training because
they download pretrained acoustic models (Use_MFA.py, NeMo.py, CTCFA.py).
This driver produces the equivalent shipped artifact for ``aligner: ctc``:
it trains the default-geometry ``CTCEncoder`` on compositional synthetic
French speech (``align.synth_speech``), validates held-out word-boundary
error against gold spans, and writes the checkpoint that ``CTCAligner``
auto-loads when constructed with no weights.

Training is FRAME-SUPERVISED, not CTC: pure CTC training on this
architecture produces temporally-bursty emissions (the global-attention
encoder is free to emit a word's characters in a spike at the word's end
— measured ~250 ms boundary error, unfixable by blank-biasing the
alignment Viterbi). The synthesizer returns gold character timing by
construction, so per-frame cross-entropy pins every emission to its
acoustic evidence; the resulting posteriors drive the same
``ctc_forced_align`` Viterbi at inference with ~frame-accurate
boundaries. The per-project ``train_ctc`` recipe (real speech, transcript
supervision only) remains pure CTC.

Unlike ``train_ctc`` (one utterance per step, any corpus directory), this
is a batched, padded, TPU-shaped loop: fixed [B, T, M] mel batches, one
jitted train step reused for every batch.

CLI: ``python -m prosody_control_french_tts_tpu pretrain-ctc [--out PATH]``.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.wavio import Audio
from .ctc_aligner import CTCAligner, save_params
from .synth_speech import SynthSpec, sample_sentences, synth_sentence

log = logging.getLogger(__name__)

PACKAGED_WEIGHTS = Path(__file__).parent / "pretrained" / "ctc_fr_synth.npz"

# Label-time offset for encoder frame j (nominal time 20j ms). Two
# conventions stack: with center=True mel frame i is centred at i·160
# samples, so the pooled encoder frame's acoustic centre is 320j+80
# (+5 ms); and states_to_words reports word spans from frame LEFT edges
# (j·frame_dt), which shifts decoded boundaries by another half frame
# (+10 ms) relative to centre-labelled targets. Empirically calibrated by
# sweeping the offset against gold spans (held-out boundary error:
# 0 ms→12.9, 5→9.1, 10→5.9, 17.5→6.2, 22.5→9.1):
_ENC_HOP_S = 0.02
_ENC_OFFSET_S = 0.010


def _frame_targets(char_spans, n_enc_frames: int, vocab) -> np.ndarray:
    """Gold char id per encoder frame; 0 (blank) for silence (edges)."""
    out = np.zeros(n_enc_frames, np.int32)
    centers = _ENC_HOP_S * np.arange(n_enc_frames) + _ENC_OFFSET_S
    for t0, t1, c in char_spans:
        lo = np.searchsorted(centers, t0, "left")
        hi = np.searchsorted(centers, t1, "left")
        out[lo:hi] = vocab.chars.index(c) + 1
    return out


def _prep_batches(al: CTCAligner, sentences: list[str], spec: SynthSpec, batch: int, seed: int):
    """Host-side prep: padded [B, T, M] mels + [B, T/2] frame targets
    (-1 = padding, ignored by the loss)."""
    mels, targets = [], []
    for i, sent in enumerate(sentences):
        audio, _, chars = synth_sentence(sent, spec, seed=seed + i, with_chars=True)
        mel = np.asarray(al.features(Audio(audio, spec.sample_rate)))
        n_enc = mel.shape[0] // 2
        if n_enc < 4:
            continue
        mels.append(mel)
        targets.append(_frame_targets(chars, n_enc, al.vocab))
    T = int(np.ceil(max(m.shape[0] for m in mels) / 128) * 128)
    n = (len(mels) // batch) * batch
    mel_arr = np.zeros((n, T, al.n_mels), np.float32)
    tgt_arr = np.full((n, T // 2), -1, np.int32)
    for i in range(n):
        mel_arr[i, : mels[i].shape[0]] = mels[i]
        tgt_arr[i, : targets[i].shape[0]] = targets[i]
    return mel_arr, tgt_arr


def _make_step(al: CTCAligner, lr: float):
    import optax

    tx = optax.adam(lr)

    @jax.jit
    def step(params, opt_state, mel, tgt):
        def loss_fn(p):
            logits = al.model.apply(p, mel)  # [B, T/2, V]
            logp = jax.nn.log_softmax(logits, axis=-1)
            valid = tgt >= 0
            safe = jnp.maximum(tgt, 0)
            ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
            return jnp.sum(jnp.where(valid, ce, 0.0)) / jnp.maximum(jnp.sum(valid), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    return tx, step


def boundary_error_ms(al: CTCAligner, sentences: list[str], spec: SynthSpec, seed: int = 10_000) -> float:
    """Mean |word-boundary error| in ms on freshly synthesized sentences
    with gold spans (the whisper_testing/splitting.py metric, exact gold)."""
    errs = []
    for i, sent in enumerate(sentences):
        audio, gold = synth_sentence(sent, spec, seed=seed + i)
        tg = al.align(Audio(audio, spec.sample_rate), sent)
        words = [(iv.min_time, iv.max_time, iv.mark) for iv in tg.tiers[0] if iv.mark.strip()]
        for (gt0, gt1, gw), (t0, t1, w) in zip(gold, words):
            if gw.lower() == w.lower():
                errs.append(abs(gt0 - t0))
                errs.append(abs(gt1 - t1))
    if not errs:
        return float("inf")
    return 1000.0 * float(np.mean(errs))


def pretrain(
    out_path: str | Path = PACKAGED_WEIGHTS,
    n_sentences: int = 384,
    epochs: int = 12,
    batch: int = 8,
    lr: float = 1e-3,
    seed: int = 0,
    target_boundary_ms: float = 60.0,
) -> tuple[CTCAligner, float]:
    """Train, gate on held-out boundary error, save float16 weights."""
    spec = SynthSpec()
    al = CTCAligner()
    al.init_params(jax.random.PRNGKey(seed))
    sentences = sample_sentences(n_sentences, seed=seed)
    mel, tgt = _prep_batches(al, sentences, spec, batch, seed)
    log.info("pretraining on %d sentences, mel %s", mel.shape[0], mel.shape)
    tx, step = _make_step(al, lr)
    params, opt = al.params, tx.init(al.params)
    rng = np.random.default_rng(seed)
    t0 = time.time()
    for epoch in range(epochs):
        order = rng.permutation(mel.shape[0])
        ep = []
        for s in range(0, len(order), batch):
            idx = order[s : s + batch]
            params, opt, loss = step(params, opt, mel[idx], tgt[idx])
            ep.append(loss)
        log.info("epoch %d: loss %.4f (%.0fs)", epoch, float(jnp.mean(jnp.stack(ep))), time.time() - t0)
    al.params = jax.tree.map(lambda x: np.asarray(x), params)

    holdout = sample_sentences(32, seed=seed + 777)
    err_ms = boundary_error_ms(al, holdout, spec)
    log.info("held-out boundary error: %.1f ms", err_ms)
    if err_ms > target_boundary_ms:
        raise RuntimeError(f"boundary error {err_ms:.1f} ms > {target_boundary_ms} ms gate")

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    half = jax.tree.map(
        lambda x: np.asarray(x, np.float16) if np.issubdtype(np.asarray(x).dtype, np.floating) else np.asarray(x),
        al.params,
    )
    save_params(half, out_path)
    log.info("saved %s (%.1f KiB)", out_path, out_path.stat().st_size / 1024)
    return al, err_ms
