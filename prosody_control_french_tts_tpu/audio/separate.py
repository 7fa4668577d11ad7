"""Trainable spectral-mask vocal isolation — the learned Demucs substitute.

The reference shells out to Demucs to strip music beds from narration
before silence-splitting (Code/Preprocessing/demucs_process.py:23-56,
output ``separated/htdemucs/<name>/vocals.wav``). The framework's default
stays the identity/copy contract and the quantile spectral gate
(audio/denoise.py), but this module adds the missing *separation-grade*
member of the family: a small jitted conv network over log-magnitude STFT
frames predicting a soft vocal mask, applied to the complex spectrum and
inverted with overlap-add.

Like the packaged CTC aligner (align/pretrain_ctc.py), the shipped
checkpoint is trained hermetically on synthetic mixtures — compositional
synthetic speech (align.synth_speech) over a deterministic music-bed
generator (chords, bass, percussion; ``synth_music``) — and gated on
held-out SI-SNR improvement. Select with ``denoise: mask`` in the pipeline
config; real-world deployments can fine-tune on their own
(mixture, vocals) pairs with ``train_masknet``.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import istft_overlap_add, stft
from ..utils.wavio import Audio

log = logging.getLogger(__name__)

N_FFT = 1024
HOP = 256
PACKAGED_WEIGHTS = Path(__file__).parent / "pretrained" / "masknet.npz"


class MaskNet(nn.Module):
    """log|X| frames [T, F] → vocal mask (0..1) [T, F]: per-utterance
    level normalisation, dilated conv stack over time (freq as features).

    Dilations grow the receptive field to ~2.5 s (±80 frames at the
    16 ms hop) with no extra parameters — local spectra cannot tell a
    babble bed from foreground narration, but seconds of temporal
    context can (the realistic-bed recipe trains on such mixtures)."""

    dim: int = 256
    layers: int = 4
    dilations: tuple[int, ...] = (1, 3, 9, 27)

    @nn.compact
    def __call__(self, logmag):
        # Per-utterance level normalisation over ACTIVE frames only (within
        # 50 dB of the loudest frame). A plain all-frame mean is dominated
        # by zero-padding: training batches are mostly speech frames while
        # separate() embeds short clips in a ~33 s padded chunk, which would
        # shift the normalisation by ~5 log10 units between train and use.
        fm = jnp.mean(logmag, axis=-1, keepdims=True)  # [..., T, 1]
        w = (fm > jnp.max(fm, axis=-2, keepdims=True) - 2.5).astype(logmag.dtype)
        mu = jnp.sum(logmag * w, axis=(-2, -1), keepdims=True) / jnp.maximum(
            jnp.sum(w, axis=(-2, -1), keepdims=True) * logmag.shape[-1], 1.0
        )
        x = logmag - mu
        x = nn.Conv(
            self.dim, kernel_size=(5,), padding="SAME",
            kernel_dilation=(self.dilations[0],), dtype=jnp.bfloat16,
        )(x)
        x = jax.nn.gelu(x)
        for i in range(self.layers - 1):
            d = self.dilations[(i + 1) % len(self.dilations)]
            h = nn.LayerNorm(dtype=jnp.float32)(x)
            h = nn.Conv(
                self.dim, kernel_size=(5,), padding="SAME",
                kernel_dilation=(d,), dtype=jnp.bfloat16,
            )(h)
            x = x + jax.nn.gelu(h)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        return jax.nn.sigmoid(nn.Dense(logmag.shape[-1], dtype=jnp.float32)(x))


def _logmag(spec):
    return jnp.log10(jnp.abs(spec) + 1e-6)


@partial(jax.jit, static_argnames=("model", "length"))
def _separate_core(model, params, x, length: int):
    spec = stft(x, n_fft=N_FFT, hop_length=HOP, center=True)  # [F, T']
    mask = model.apply(params, _logmag(spec).T)  # [T', F]
    return istft_overlap_add(spec * mask.T, N_FFT, HOP, length)


class MaskSeparator:
    """Separator protocol object: ``separate(audio) -> Audio`` (vocals)."""

    SAMPLE_RATE = 16000  # the packaged checkpoint's training rate
    CHUNK = 1 << 19  # ~33 s per compiled program
    HALO = 96 * HOP  # context each side of a chunk — covers the dilated
    # stack's ±80-frame receptive field so chunk edges see full context

    def __init__(
        self,
        params=None,
        weights_path: str | Path | None = None,
        dim: int = 256,
        layers: int = 4,
        autoload: bool = True,
    ):
        self.model = MaskNet(dim=dim, layers=layers)
        if weights_path is not None:
            params = load_params(weights_path)
        elif params is None and autoload and dim == 256 and layers == 4 and PACKAGED_WEIGHTS.exists():
            params = load_params(PACKAGED_WEIGHTS)
        self.params = params

    def init_params(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.params = self.model.init(rng, jnp.zeros((16, N_FFT // 2 + 1)))
        return self.params

    def separate(self, audio: Audio) -> Audio:
        """Vocal estimate at the input's own rate. Processing happens at
        the checkpoint's 16 kHz training rate (the mask is a function of
        STFT-bin frequencies — CTCAligner.features makes the same move)
        in fixed ~33 s chunks with n_fft halos, so arbitrarily long
        recordings reuse ONE compiled program with bounded memory."""
        from ..utils.wavio import resample

        if self.params is None:
            raise ValueError("MaskSeparator has no weights; pretrain or pass weights_path")
        a = audio.to_mono()
        orig_rate = a.rate
        if a.rate != self.SAMPLE_RATE:
            a = resample(a, self.SAMPLE_RATE)
        x = np.asarray(a.samples, np.float32)
        n = x.shape[-1]
        C, H = self.CHUNK, self.HALO
        out = np.zeros(n, np.float32)
        for s in range(0, n, C):
            lo = max(s - H, 0)
            hi = min(s + C + H, n)
            seg = np.zeros(C + 2 * H, np.float32)
            seg[: hi - lo] = x[lo:hi]
            y = np.asarray(_separate_core(self.model, self.params, jnp.asarray(seg), C + 2 * H))
            out[s : min(s + C, n)] = y[s - lo : s - lo + min(C, n - s)]
        res = Audio(out.astype(np.float32, copy=False), self.SAMPLE_RATE)
        if orig_rate != self.SAMPLE_RATE:
            res = resample(res, orig_rate)
        return res


# ---------------------------------------------------------------------------
# deterministic music-bed generator (training mixtures)
# ---------------------------------------------------------------------------

_CHORDS = [  # root frequencies (Hz) of simple triads
    (130.8, 164.8, 196.0),
    (146.8, 185.0, 220.0),
    (98.0, 123.5, 146.8),
    (110.0, 138.6, 164.8),
]


def synth_music(duration_s: float, rate: int = 16000, seed: int = 0) -> np.ndarray:
    """Deterministic music bed: slow chord pads + bass line + percussive
    noise bursts — wide-band interference overlapping the speech band."""
    rng = np.random.default_rng(seed)
    n = int(duration_s * rate)
    t = np.arange(n) / rate
    out = np.zeros(n, np.float32)
    bar = max(int(0.8 * rate), 1)
    for b in range(0, n, bar):
        chord = _CHORDS[(b // bar) % len(_CHORDS)]
        seg = slice(b, min(b + bar, n))
        tt = t[seg] - t[seg.start]
        env = np.minimum(1.0, tt / 0.02) * np.exp(-tt * 1.2)
        for f in chord:
            for harm, amp in ((1, 0.5), (2, 0.25), (3, 0.12)):
                out[seg] += amp * env * np.sin(2 * np.pi * f * harm * (t[seg] + rng.uniform(0, 1e-3)))
        # bass an octave down
        out[seg] += 0.6 * env * np.sin(2 * np.pi * chord[0] / 2 * t[seg])
        # hat/snare-ish noise bursts on the half-bar
        for off in (0, bar // 2):
            s0 = b + off
            if s0 + rate // 50 < n:
                burst = rng.standard_normal(rate // 50) * np.exp(-np.arange(rate // 50) / (rate / 400))
                out[s0 : s0 + rate // 50] += 0.35 * burst
    peak = np.max(np.abs(out)) + 1e-9
    return (0.5 * out / peak).astype(np.float32)


def _pink_noise(n: int, rng: np.random.Generator) -> np.ndarray:
    """1/f-shaped broadband noise (spectral slope of real room/program
    beds), via rfft shaping."""
    # float32 throughout: f64 elementwise host math is ~150× slower on this
    # vCPU (CLAUDE.md), and the recipe builds hundreds of beds
    w = rng.standard_normal(n).astype(np.float32)
    spec = np.fft.rfft(w)
    f = np.arange(spec.size, dtype=np.float32)
    spec = (spec / np.sqrt(np.maximum(f, 1.0))).astype(np.complex64)
    out = np.fft.irfft(spec, n).astype(np.float32)
    return (out / (np.std(out) + 1e-9)).astype(np.float32)


def _comb_reverb(x: np.ndarray, rate: int, rng: np.random.Generator) -> np.ndarray:
    """Cheap Schroeder-style reverb: a few feedback combs + damping —
    enough to smear transients the way real rooms do."""
    out = np.array(x, np.float32)  # f32 accumulator suffices for a ~4 s bed
    for delay_ms, gain in ((31.0, 0.45), (43.0, 0.35), (59.0, 0.25)):
        d = int((delay_ms + rng.uniform(-3, 3)) * rate / 1000.0)
        # IIR comb y[n] = x[n] + g·y[n−d], block-propagated d samples a time
        y = np.array(out)
        for k in range(1, len(y) // d + 1):
            seg = slice(k * d, min((k + 1) * d, len(y)))
            prev = slice((k - 1) * d, (k - 1) * d + (seg.stop - seg.start))
            y[seg] += gain * y[prev]
        out = y
    return (out / (np.max(np.abs(out)) + 1e-9) * (np.max(np.abs(x)) + 1e-9)).astype(np.float32)


BED_KINDS = ("chords", "noise", "reverb_chords", "babble")


def synth_bed(duration_s: float, rate: int = 16000, seed: int = 0, kind: str = "chords") -> np.ndarray:
    """Interference bed of the given kind — the spread of program material
    a real narration sits on (VERDICT r2 #8: synth_music alone models only
    clean tonal beds):

    - ``chords``: the tonal pad/bass/percussion generator (synth_music);
    - ``noise``: 1/f broadband bed (room tone, hiss, crowd wash);
    - ``reverb_chords``: the tonal bed smeared by comb reverb;
    - ``babble``: overlapped synthetic speech — the hardest case, energy
      statistics matching the foreground.
    """
    rng = np.random.default_rng(seed)
    n = int(duration_s * rate)
    if kind == "chords":
        return synth_music(duration_s, rate, seed)
    if kind == "noise":
        return (0.5 * _pink_noise(n, rng)).astype(np.float32)
    if kind == "reverb_chords":
        return _comb_reverb(synth_music(duration_s, rate, seed), rate, rng)
    if kind == "babble":
        from ..align.synth_speech import SynthSpec, sample_sentences, synth_sentence

        spec = SynthSpec(sample_rate=rate)
        out = np.zeros(n, np.float32)
        for v in range(3):
            sent = sample_sentences(1, seed=seed + 31 * v + 7)[0]
            s, _ = synth_sentence(sent, spec, seed=seed + 97 * v)
            off = int(rng.uniform(0, max(n - s.size, 1)))
            seg = s[: max(n - off, 0)]
            out[off : off + seg.size] += 0.5 * seg
        peak = np.max(np.abs(out)) + 1e-9
        return (0.5 * out / peak).astype(np.float32)
    raise ValueError(f"unknown bed kind {kind!r}")


# ---------------------------------------------------------------------------
# pretraining on synthetic + real-speech mixtures
# ---------------------------------------------------------------------------

# Real-narration corpus for the TRAINING RECIPE only (`pretrain-masknet`
# CLI / pretrain_masknet) — the shipped separator never reads it at
# inference. Defaults to the reference's bundled fixture wavs (data, not
# code); point ``PCFT_REAL_CORPUS`` at any directory of
# ``segment_ph<N>.wav`` narration files to retrain elsewhere.
REAL_CORPUS = Path(
    os.environ.get("PCFT_REAL_CORPUS", "/root/reference/Data/voice/records/audio")
)


def real_speech_windows(
    rate: int = 16000, window_s: float = 4.0, segments: tuple[int, ...] = (2, 3, 4, 5, 6, 7, 8, 9)
) -> list[np.ndarray]:
    """Clean REAL French narration windows from the training corpus
    (REAL_CORPUS / ``PCFT_REAL_CORPUS``) — ground-truth vocals for mixture
    training. Segments 10/11 are reserved for held-out evaluation."""
    from ..utils.wavio import read_wav, resample

    if not REAL_CORPUS.is_dir():
        log.warning(
            "real-narration corpus %s missing — the 'realistic' recipe falls "
            "back to synthetic-only vocals (set PCFT_REAL_CORPUS)",
            REAL_CORPUS,
        )
        return []
    out = []
    for nseg in segments:
        p = REAL_CORPUS / f"segment_ph{nseg}.wav"
        if not p.exists():
            continue
        a = read_wav(p).to_mono()
        if a.rate != rate:
            a = resample(a, rate)
        x = np.asarray(a.samples, np.float32)
        w = int(window_s * rate)
        for s in range(0, x.size - w + 1, w):
            win = x[s : s + w]
            if np.std(win) > 1e-3:  # skip near-silent windows
                out.append(win)
    return out


def _mix_at_snr(speech: np.ndarray, bed: np.ndarray, snr_db: float) -> np.ndarray:
    g = 10.0 ** (-snr_db / 20.0) * (np.std(speech) + 1e-9) / (np.std(bed) + 1e-9)
    return (speech + g * bed[: speech.size]).astype(np.float32)


def _make_pairs(
    n: int,
    seed: int,
    rate: int = 16000,
    realistic: bool = True,
    real_segments: tuple[int, ...] | None = None,
):
    """(mixture, clean-vocals) pairs. ``realistic`` (the packaged recipe)
    draws bed kinds from BED_KINDS, SNRs from −5..15 dB, and replaces half
    of the synthetic vocals with REAL narration windows — plain
    synth_music chords at 0..12 dB otherwise (the round-2 recipe, kept for
    the regression tests). ``real_segments`` selects which corpus segments
    supply the real vocals (training default; pass (10, 11) for held-out
    evaluation pairs so eval vocals never overlap training content)."""
    from ..align.synth_speech import SynthSpec, sample_sentences, synth_sentence

    spec = SynthSpec(sample_rate=rate)
    rng = np.random.default_rng(seed)
    if realistic:
        real = (
            real_speech_windows(rate, segments=real_segments)
            if real_segments is not None
            else real_speech_windows(rate)
        )
    else:
        real = []
    pairs = []
    for i, sent in enumerate(sample_sentences(n, seed=seed, min_words=4, max_words=8)):
        if realistic and real and i % 2 == 1:
            speech = real[int(rng.integers(0, len(real)))]
        else:
            speech, _ = synth_sentence(sent, spec, seed=seed + i)
        # +0.1 s margin: int(duration*rate) can round one sample short
        kind = BED_KINDS[int(rng.integers(0, len(BED_KINDS)))] if realistic else "chords"
        bed = synth_bed(speech.size / rate + 0.1, rate, seed=seed + 10_000 + i, kind=kind)
        snr_db = rng.uniform(-5.0, 15.0) if realistic else rng.uniform(0.0, 12.0)
        pairs.append((_mix_at_snr(speech, bed, snr_db), speech))
    return pairs


def real_mixture_eval(
    sep: "MaskSeparator", seed: int = 0, rate: int = 16000, snrs=(0.0, 5.0, 10.0)
) -> float:
    """Mean SI-SNR improvement on mixtures of HELD-OUT real narration
    (segments 10/11, never in training) with held-out beds of every kind —
    the realistic-material figure VERDICT r2 #8 asks to record."""
    clips = real_speech_windows(rate, segments=(10, 11))
    if not clips:
        log.warning("no held-out real narration available — real-mixture gate SKIPPED")
        return float("nan")
    rng = np.random.default_rng(seed)
    gains = []
    for i, clip in enumerate(clips[:8]):
        kind = BED_KINDS[i % len(BED_KINDS)]
        bed = synth_bed(clip.size / rate + 0.1, rate, seed=seed + 777 + i, kind=kind)
        mix = _mix_at_snr(clip, bed, float(snrs[i % len(snrs)]))
        est = np.asarray(sep.separate(Audio(mix, rate)).samples, np.float32)
        m = min(est.size, clip.size)
        g = si_snr_db(est[:m], clip[:m]) - si_snr_db(mix[:m], clip[:m])
        log.info("real-mixture eval: clip %d kind=%s snr=%+.0f dB -> gain %+.2f dB",
                 i, kind, float(snrs[i % len(snrs)]), g)
        gains.append(g)
    return float(np.mean(gains))


def _prep_batches(pairs, batch: int):
    """Fixed-shape batched featurisation: waveforms zero-pad to one
    bucketed corpus length and go through ONE compiled batched stft in
    chunks. (The per-pair variable-shape stft it replaces compiled one
    executable per distinct clip length and pulled each result over the
    device link separately — hundreds of distinct executables, which the
    remote TPU backend answers with UNIMPLEMENTED transfer errors; see
    ROADMAP 'mid-suite' note.)"""
    n = (len(pairs) // batch) * batch
    if n < len(pairs):
        log.info("dropping %d mixtures to fill %d-sized batches", len(pairs) - n, batch)
    Tmax = max(m.size for m, _ in pairs[:n])
    Tmax = int(np.ceil(Tmax / (HOP * 64)) * (HOP * 64))  # frame-bucketed
    wav = np.zeros((2 * n, Tmax), np.float32)
    for i, (m, c) in enumerate(pairs[:n]):
        wav[2 * i, : m.size] = m
        wav[2 * i + 1, : c.size] = c
    mags = []
    CH = 16
    for s in range(0, wav.shape[0], CH):
        chunk = wav[s : s + CH]
        if chunk.shape[0] < CH:  # keep one program shape
            chunk = np.pad(chunk, ((0, CH - chunk.shape[0]), (0, 0)))
        # |.| on device: complex64 readback is UNIMPLEMENTED on the remote
        # TPU backend (float works), and the transfer halves
        mags.append(np.asarray(jnp.abs(stft(jnp.asarray(chunk), N_FFT, HOP))))
    mag = np.concatenate(mags)[: 2 * n].transpose(0, 2, 1)  # [2n, T', F]
    Tm = mag.shape[1]
    mix = np.ascontiguousarray(mag[0::2])
    clean = np.ascontiguousarray(mag[1::2])
    valid = np.zeros((n, Tm), bool)
    for i, (m, _) in enumerate(pairs[:n]):
        valid[i, : min(1 + m.size // HOP, Tm)] = True
    return mix, clean, valid


def si_snr_db(est: np.ndarray, ref: np.ndarray) -> float:
    ref = ref - ref.mean()
    est = est - est.mean()
    s = np.dot(est, ref) / (np.dot(ref, ref) + 1e-9) * ref
    e = est - s
    return float(10.0 * np.log10((np.dot(s, s) + 1e-9) / (np.dot(e, e) + 1e-9)))


def pretrain_masknet(
    out_path: str | Path = PACKAGED_WEIGHTS,
    n_mixtures: int = 256,
    epochs: int = 10,
    batch: int = 4,
    lr: float = 3e-4,
    seed: int = 0,
    target_si_snr_gain_db: float = 5.0,
    realistic: bool = True,
    target_real_gain_db: float = 3.0,
) -> tuple["MaskSeparator", float]:
    """Train on speech+bed mixtures (``realistic``: diverse bed kinds,
    −5..15 dB SNRs, a third REAL narration vocals); gate on held-out
    synthetic SI-SNR improvement AND on held-out real-speech mixtures
    (real_mixture_eval — segments 10/11 + unseen beds); save float16
    weights."""
    import optax

    sep = MaskSeparator(autoload=False)
    sep.init_params(jax.random.PRNGKey(seed))
    pairs = _make_pairs(n_mixtures, seed, realistic=realistic)
    mix, clean, valid = _prep_batches(pairs, batch)
    log.info("masknet: %d mixtures, frames %s", mix.shape[0], mix.shape[1:])
    steps_total = max(1, (mix.shape[0] // batch) * epochs)
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps_total, alpha=0.05))
    params, opt = sep.params, tx.init(sep.params)

    @jax.jit
    def step(params, opt_state, m, c, v):
        def loss_fn(p):
            mask = sep.model.apply(p, jnp.log10(m + 1e-6))
            # power-compressed spectral MSE (|X|^0.3): linear-magnitude MSE
            # is dominated by the loudest bins, starving pauses and noise
            # floors of gradient — exactly where real narration suffers
            comp = lambda z: jnp.power(z + 1e-4, 0.3)
            err = (comp(mask * m) - comp(c)) * v[..., None]
            return jnp.sum(err * err) / jnp.maximum(jnp.sum(v) * m.shape[-1], 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    import time

    t0 = time.time()
    for epoch in range(epochs):
        order = rng.permutation(mix.shape[0])
        ep = []
        for s in range(0, len(order), batch):
            idx = order[s : s + batch]
            params, opt, loss = step(params, opt, mix[idx], clean[idx], valid[idx])
            ep.append(float(loss))
        log.info("epoch %d: loss %.5f (%.0fs)", epoch, float(np.mean(ep)), time.time() - t0)
    sep.params = jax.tree.map(np.asarray, params)

    # held-out SI-SNR improvement through the full separate() path — the
    # real vocal halves come from segments 10/11 (never in training), so a
    # checkpoint that memorised the training narration cannot pass on
    # familiar vocal content under unfamiliar beds
    gains = []
    for mix_x, clean_x in _make_pairs(12, seed + 555, realistic=realistic, real_segments=(10, 11)):
        est = np.asarray(sep.separate(Audio(mix_x, 16000)).samples, np.float32)
        n = min(est.size, clean_x.size)
        gains.append(si_snr_db(est[:n], clean_x[:n]) - si_snr_db(mix_x[:n], clean_x[:n]))
    gain = float(np.mean(gains))
    log.info("held-out SI-SNR improvement: %.2f dB", gain)
    if gain < target_si_snr_gain_db:
        raise RuntimeError(f"SI-SNR gain {gain:.2f} dB < {target_si_snr_gain_db} dB gate")
    if realistic:
        real_gain = real_mixture_eval(sep, seed=seed)
        log.info("held-out REAL-speech mixture SI-SNR improvement: %.2f dB", real_gain)
        if not np.isfinite(real_gain):
            log.warning(
                "real-mixture SI-SNR gate DID NOT RUN (no segment_ph10/11 under "
                "%s) — the checkpoint is gated on synthetic mixtures only",
                REAL_CORPUS,
            )
        elif real_gain < target_real_gain_db:
            raise RuntimeError(
                f"real-mixture SI-SNR gain {real_gain:.2f} dB < {target_real_gain_db} dB gate"
            )

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    half = jax.tree.map(
        lambda x: np.asarray(x, np.float16) if np.issubdtype(np.asarray(x).dtype, np.floating) else np.asarray(x),
        sep.params,
    )
    save_params(half, out_path)
    log.info("saved %s (%.1f KiB)", out_path, out_path.stat().st_size / 1024)
    return sep, gain


def save_params(params, path: str | Path) -> None:
    from ..align.ctc_aligner import save_params as _save

    _save(params, path)


def load_params(path: str | Path):
    from ..align.ctc_aligner import load_params as _load

    return _load(path)
