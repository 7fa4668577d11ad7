"""Exact int16 ↔ float32 PCM conversion — the ONE scale convention.

int16 PCM decodes to float32 as ``x / 32768`` (utils/wavio, native/audioio);
every fast path that ships audio as a lossless int16 image (halved
host→device transfer on the ~25–40 MB/s tunnel: prosody/measure corpus
upload, ops/energy silence scan) must quantise and unquantise with exactly
this pair or results silently drift. Both helpers live here so the
convention has a single home (the unscale used to be copy-pasted at six
call sites).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

I16_SCALE = 32768.0


def i16_to_f32(a):
    """Unscale an int16 PCM image to float32 (numpy arrays or jnp
    arrays/tracers — exact: every int16 value is representable in f32)."""
    if isinstance(a, np.ndarray):
        return a.astype(np.float32) * np.float32(1.0 / I16_SCALE)
    return a.astype(jnp.float32) * jnp.float32(1.0 / I16_SCALE)


def f32_to_i16_exact(x: np.ndarray) -> np.ndarray | None:
    """Return the int16 image of float32 ``x`` when the round-trip through
    :func:`i16_to_f32` is bit-exact (wav-sourced audio decoded from int16
    PCM always is), else None. Full-scale negative samples (−32768 ↔ −1.0,
    common in clipped recordings) are representable and accepted.

    Probes a strided slice first so resampled/synthetic float audio fails
    fast without paying full passes over a whole corpus."""
    if x.dtype != np.float32:
        return None
    probe = x.reshape(-1)[:: max(1, x.size // 4096)]
    if _quantise(probe) is None:
        return None
    return _quantise(x)


def _quantise(x: np.ndarray) -> np.ndarray | None:
    q = np.rint(x * I16_SCALE)
    if q.max(initial=0.0) > 32767.0 or q.min(initial=0.0) < -32768.0:
        return None
    qi = q.astype(np.int16)
    if np.array_equal(i16_to_f32(qi), x):
        return qi
    return None
