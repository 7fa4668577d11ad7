"""Spectral-gating denoiser (jitted) — the in-framework alternative to the
reference's external Demucs subprocess (Code/Preprocessing/demucs_process.py).

Demucs is a heavyweight source-separation model; the pipeline only needs
"clean the narration before silence-splitting". This implements the
classic noise-gate estimator:

1. STFT magnitude; per-frequency noise floor = a low quantile over time
   (the quietest frames are assumed to be noise);
2. soft mask = sigmoid of the SNR above the floor (threshold/softness in
   dB), time-smoothed to avoid musical noise;
3. inverse STFT with overlap-add (Hann, 75 % overlap, COLA-exact).

The pipeline's ``denoise_command`` hook still allows plugging an external
separator; failures degrade to a copy of the input, the reference's own
contract (demucs_process.py:33-39).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.wavio import Audio
from ..ops.stft import stft


@partial(jax.jit, static_argnames=("n_fft", "hop", "noise_quantile"))
def _denoise_core(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop: int = 256,
    noise_quantile: float = 0.1,
    threshold_db: float = 9.0,
    softness_db: float = 3.0,
    smooth: float = 0.5,
):
    spec = stft(x, n_fft=n_fft, hop_length=hop, center=True)  # [F, T]
    mag = jnp.abs(spec)
    # per-frequency noise floor from the quietest frames
    floor = jnp.quantile(mag, noise_quantile, axis=-1, keepdims=True)
    snr_db = 20.0 * (jnp.log10(mag + 1e-10) - jnp.log10(floor + 1e-10))
    mask = jax.nn.sigmoid((snr_db - threshold_db) / softness_db)

    # time smoothing of the mask (EMA both directions → zero-phase-ish)
    def ema(m):
        def step(prev, cur):
            v = smooth * prev + (1 - smooth) * cur
            return v, v

        _, out = jax.lax.scan(step, m[:, 0], m.T[1:])
        return jnp.concatenate([m[:, :1], out.T], axis=1)

    mask = ema(ema(mask[:, ::-1])[:, ::-1])
    from ..ops.stft import istft_overlap_add

    return istft_overlap_add(spec * mask, n_fft, hop, x.shape[-1])


def denoise(audio: Audio, **kw) -> Audio:
    x = jnp.asarray(np.asarray(audio.to_mono().samples, np.float32))
    y = np.asarray(_denoise_core(x, **kw))
    return Audio(y.astype(np.float32, copy=False), audio.rate)
