"""Batched STFT / spectrogram (librosa-compatible conventions).

Serves the visualisation endpoints (the reference uses
``librosa.stft(y, n_fft=1024)`` with centre padding,
Code/visualisation/acoustic_analysis.py:98-113) and provides log-mel
features for the alignment models.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _hann(n: int) -> np.ndarray:
    # periodic Hann (librosa/scipy get_window default)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center"))
def stft(x: jnp.ndarray, n_fft: int = 1024, hop_length: int | None = None, center: bool = True):
    """Complex STFT, shape [..., 1 + n_fft/2, frames] (librosa layout)."""
    hop = hop_length or n_fft // 4
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode="reflect")
    T = x.shape[-1]
    n_frames = 1 + (T - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = jnp.take(x, idx, axis=-1) * jnp.asarray(_hann(n_fft))
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


@partial(jax.jit, static_argnames=("n_fft", "hop", "length"))
def istft_overlap_add(spec: jnp.ndarray, n_fft: int, hop: int, length: int) -> jnp.ndarray:
    """Inverse of ``stft(center=True)`` by windowed overlap-add with
    squared-window normalisation. spec: [F, T'] complex (librosa layout)
    → [length] samples. Shared by the spectral-gate denoiser and the
    mask-based separator."""
    frames = jnp.fft.irfft(spec.T, n=n_fft, axis=-1)  # [T', n_fft]
    win = jnp.asarray(_hann(n_fft))
    frames = frames * win[None, :]
    n_frames = frames.shape[0]
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    total = length + 2 * n_fft
    out = jnp.zeros(total, frames.dtype).at[idx.reshape(-1)].add(frames.reshape(-1))
    wsum = jnp.zeros(total, frames.dtype).at[idx.reshape(-1)].add(
        jnp.tile(win * win, (n_frames,))
    )
    y = out / jnp.maximum(wsum, 1e-8)
    return y[n_fft // 2 : n_fft // 2 + length]


def spectrogram(
    x: jnp.ndarray, n_fft: int = 1024, hop_length: int | None = None, power: float = 2.0, db: bool = True
):
    s = jnp.abs(stft(x, n_fft, hop_length)) ** power
    if not db:
        return s
    ref = jnp.max(s, axis=(-2, -1), keepdims=True)
    return 10.0 * jnp.log10(jnp.maximum(s, 1e-10) / jnp.maximum(ref, 1e-10))


def mel_filterbank(sr: float, n_fft: int, n_mels: int = 80, fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """Slaney-style mel filterbank [n_mels, 1+n_fft/2] (librosa default)."""
    fmax = fmax or sr / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3.0)
        log_region = f >= 1000.0
        mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0) / (np.log(6.4) / 27.0), mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3.0)
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz = mel_to_hz(mels)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((n_mels, len(bins)), dtype=np.float32)
    for i in range(n_mels):
        lo, ctr, hi = hz[i], hz[i + 1], hz[i + 2]
        up = (bins - lo) / max(ctr - lo, 1e-9)
        down = (hi - bins) / max(hi - ctr, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        enorm = 2.0 / (hi - lo)
        fb[i] *= enorm
    return fb


def _dft_mats(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT analysis matrices [n_fft, 1 + n_fft//2] (cos, −sin)."""
    F = 1 + n_fft // 2
    k = np.arange(F)[None, :]
    t = np.arange(n_fft)[:, None]
    ang = 2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length", "n_mels"))
def log_mel(x: jnp.ndarray, sr: float, n_fft: int = 400, hop_length: int = 160, n_mels: int = 80):
    """Log-mel features [..., frames, n_mels] — the acoustic front-end for
    the CTC aligner and Whisper-style encoder (Whisper convention:
    log10, clamped to max−8, scaled).

    The power spectrum runs as TWO split-precision DFT matmuls on the MXU
    (ops.precision.mm_split3, ~1e-5 rel) instead of jnp.fft.rfft: on the
    bench chip the FFT lowering made the mel front-end 10× the cost of the
    ENTIRE fused decode+DTW launch (513 ms vs 52 ms at the corpus batch
    shape, tools/profile_whisper.py) — the same finding as the pitch
    kernel's spectrum (ops/pitch.py), where the MXU path is both ~10×
    faster and more accurate than the TPU FFT."""
    from .precision import mm_split3

    hop = hop_length
    pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    xp = jnp.pad(x, pad, mode="reflect")
    T = xp.shape[-1]
    n_frames = 1 + (T - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = jnp.take(xp, idx, axis=-1) * jnp.asarray(_hann(n_fft))  # [..., T', n_fft]
    C, S = _dft_mats(n_fft)
    lead = frames.shape[:-1]
    flat = frames.reshape((-1, n_fft))
    re = mm_split3(flat, jnp.asarray(C))
    im = mm_split3(flat, jnp.asarray(S))
    power = (re * re + im * im).reshape((*lead, C.shape[1]))  # [..., T', F]
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    mel = jnp.einsum("mf,...tf->...tm", fb, power)
    logm = jnp.log10(jnp.maximum(mel, 1e-10))
    logm = jnp.maximum(logm, jnp.max(logm, axis=(-2, -1), keepdims=True) - 8.0)
    return (logm + 4.0) / 4.0
