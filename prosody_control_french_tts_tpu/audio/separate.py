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
    level normalisation, conv stack over time (freq as features)."""

    dim: int = 256
    layers: int = 3

    @nn.compact
    def __call__(self, logmag):
        x = logmag - jnp.mean(logmag, axis=(-2, -1), keepdims=True)
        x = nn.Conv(self.dim, kernel_size=(5,), padding="SAME", dtype=jnp.bfloat16)(x)
        x = jax.nn.gelu(x)
        for _ in range(self.layers - 1):
            h = nn.LayerNorm(dtype=jnp.float32)(x)
            h = nn.Conv(self.dim, kernel_size=(5,), padding="SAME", dtype=jnp.bfloat16)(h)
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
    HALO = 4 * N_FFT  # context kept on each side of a chunk

    def __init__(
        self,
        params=None,
        weights_path: str | Path | None = None,
        dim: int = 256,
        layers: int = 3,
        autoload: bool = True,
    ):
        self.model = MaskNet(dim=dim, layers=layers)
        if weights_path is not None:
            params = load_params(weights_path)
        elif params is None and autoload and dim == 256 and layers == 3 and PACKAGED_WEIGHTS.exists():
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
        res = Audio(out.astype(np.float64), self.SAMPLE_RATE)
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
    out = np.zeros(n)
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


# ---------------------------------------------------------------------------
# pretraining on synthetic mixtures
# ---------------------------------------------------------------------------


def _make_pairs(n: int, seed: int, rate: int = 16000):
    from ..align.synth_speech import SynthSpec, sample_sentences, synth_sentence

    spec = SynthSpec(sample_rate=rate)
    rng = np.random.default_rng(seed)
    pairs = []
    for i, sent in enumerate(sample_sentences(n, seed=seed, min_words=4, max_words=8)):
        speech, _ = synth_sentence(sent, spec, seed=seed + i)
        # +0.1 s margin: int(duration*rate) can round one sample short
        music = synth_music(speech.size / rate + 0.1, rate, seed=seed + 10_000 + i)[: speech.size]
        snr_db = rng.uniform(0.0, 12.0)
        g = 10.0 ** (-snr_db / 20.0) * (np.std(speech) + 1e-9) / (np.std(music) + 1e-9)
        pairs.append((speech + g * music, speech))
    return pairs


def _prep_batches(pairs, batch: int):
    specs = []
    for mix, clean in pairs:
        sm = np.asarray(stft(jnp.asarray(mix), N_FFT, HOP))
        sc = np.asarray(stft(jnp.asarray(clean), N_FFT, HOP))
        specs.append((np.abs(sm).T, np.abs(sc).T))  # [T', F]
    Tm = max(s[0].shape[0] for s in specs)
    Tm = int(np.ceil(Tm / 16) * 16)
    n = (len(specs) // batch) * batch
    if n < len(specs):
        log.info("dropping %d mixtures to fill %d-sized batches", len(specs) - n, batch)
    F = specs[0][0].shape[1]
    mix = np.zeros((n, Tm, F), np.float32)
    clean = np.zeros((n, Tm, F), np.float32)
    valid = np.zeros((n, Tm), bool)
    for i in range(n):
        m, c = specs[i]
        mix[i, : m.shape[0]] = m
        clean[i, : c.shape[0]] = c
        valid[i, : m.shape[0]] = True
    return mix, clean, valid


def si_snr_db(est: np.ndarray, ref: np.ndarray) -> float:
    ref = ref - ref.mean()
    est = est - est.mean()
    s = np.dot(est, ref) / (np.dot(ref, ref) + 1e-9) * ref
    e = est - s
    return float(10.0 * np.log10((np.dot(s, s) + 1e-9) / (np.dot(e, e) + 1e-9)))


def pretrain_masknet(
    out_path: str | Path = PACKAGED_WEIGHTS,
    n_mixtures: int = 192,
    epochs: int = 8,
    batch: int = 4,
    lr: float = 3e-4,
    seed: int = 0,
    target_si_snr_gain_db: float = 5.0,
) -> tuple["MaskSeparator", float]:
    """Train on synthetic speech+music mixtures; gate on held-out SI-SNR
    improvement; save float16 weights."""
    import optax

    sep = MaskSeparator(autoload=False)
    sep.init_params(jax.random.PRNGKey(seed))
    pairs = _make_pairs(n_mixtures, seed)
    mix, clean, valid = _prep_batches(pairs, batch)
    log.info("masknet: %d mixtures, frames %s", mix.shape[0], mix.shape[1:])
    tx = optax.adam(lr)
    params, opt = sep.params, tx.init(sep.params)

    @jax.jit
    def step(params, opt_state, m, c, v):
        def loss_fn(p):
            mask = sep.model.apply(p, jnp.log10(m + 1e-6))
            err = (mask * m - c) * v[..., None]
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

    # held-out SI-SNR improvement through the full separate() path
    gains = []
    for mix_x, clean_x in _make_pairs(12, seed + 555):
        est = np.asarray(sep.separate(Audio(mix_x, 16000)).samples, np.float32)
        n = min(est.size, clean_x.size)
        gains.append(si_snr_db(est[:n], clean_x[:n]) - si_snr_db(mix_x[:n], clean_x[:n]))
    gain = float(np.mean(gains))
    log.info("held-out SI-SNR improvement: %.2f dB", gain)
    if gain < target_si_snr_gain_db:
        raise RuntimeError(f"SI-SNR gain {gain:.2f} dB < {target_si_snr_gain_db} dB gate")

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
