"""RMS / dBFS energy scans and pydub-parity silence detection.

Replaces pydub's ``detect_silence`` / ``split_on_silence`` (the reference's
corpus segmenter, Code/Preprocessing/preprocess_audio.py:41-46) and its RMS
dBFS conventions (used for noise gating in
Code/Aligners/use_whisper_timestamped.py:197-229 and loudness deltas in
Code/Pipeline/compute_loudness_adjustments.py:8-25).

The naive pydub scan is O(T·window) — it recomputes the RMS of a
``min_silence_len`` window at every millisecond. Here a single cumulative
sum of squared samples turns every window RMS into two gathers, so scanning
an hour of audio is one fused jit. Semantics parity with pydub:

- dBFS is relative to the *integer* full-scale amplitude
  (``20·log10(rms/32768)`` for int16 sources);
- windows start at every millisecond (``seek_step=1``), a window is silent
  iff ``rms <= 10^(thresh_db/20)·max_amplitude``;
- silent windows merge into ranges ``[first_start, last_start+window]``,
  splitting only when a gap exceeds the window length;
- ``split_on_silence`` pads each nonsilent range by ``keep_silence`` ms and
  splits overlapping pads at their midpoint (pydub's pairwise rule).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def rms(x: np.ndarray | jnp.ndarray, int_scale: float = 32768.0) -> float:
    """pydub/audioop RMS: sqrt(mean(sample²)) on integer-scale samples,
    truncated to an integer (audioop returns int).

    Elementwise math stays float32 (f64 elementwise is ~150× slower on the
    target vCPU — CLAUDE.md; this runs per wav over whole corpora in
    eval/corpus_compare); only the reduction accumulates in float64, so the
    result is within ~1e-7 relative of the all-f64 formulation."""
    sq = np.square(np.asarray(x, dtype=np.float32) * np.float32(int_scale))
    v = np.sqrt(np.sum(sq, dtype=np.float64) / max(sq.size, 1))
    return float(np.floor(v))


def dbfs(x: np.ndarray | jnp.ndarray, int_scale: float = 32768.0) -> float:
    """pydub AudioSegment.dBFS (−inf for digital silence)."""
    r = rms(x, int_scale)
    if r == 0:
        return -np.inf
    return 20.0 * float(np.log10(r / int_scale))


@partial(jax.jit, static_argnames=("rate", "window_ms"))
def _window_rms_sq(x: jnp.ndarray, rate: int, window_ms: int) -> jnp.ndarray:
    """Mean-square of every window of ``window_ms`` starting at each
    millisecond boundary. x: [T] float in [-1,1) — or an int16 image of it
    (cast on device; halves the host→device transfer, the dominant cost of
    the silence scan on remote runtimes). Returns [n_starts]."""
    from .cumsum import chunked_cumsum_sq

    if x.dtype == jnp.int16:
        from .pcm import i16_to_f32

        x = i16_to_f32(x)

    T = x.shape[-1]
    cs = chunked_cumsum_sq(x)
    total_ms = int(T * 1000 // rate)
    n_starts = max(total_ms - window_ms + 1, 0)

    def ms_to_samp(ms):
        # exact ⌊ms·rate/1000⌋ in int32: ms·rate overflows int32 and a
        # float32 product loses integer precision past 2²⁴ (~6 min of
        # 44.1 kHz), which misaligned window boundaries on long recordings
        q, r = ms // 1000, ms % 1000
        return q * rate + (r * rate) // 1000

    starts_ms = jnp.arange(n_starts)
    lo = ms_to_samp(starts_ms)
    hi = jnp.minimum(ms_to_samp(starts_ms + window_ms), T)
    cnt = jnp.maximum(hi - lo, 1)
    # bounded-width range sums: differencing the global float32 prefix
    # would put position-proportional rounding (multi-dB at hour scale)
    # into near-threshold windows
    max_span = (window_ms * rate) // 1000 + 1
    return cs.range_sum_local(lo, hi, max_span) / cnt


def detect_silence(
    x: np.ndarray,
    rate: int,
    min_silence_len: int = 1000,
    silence_thresh: float = -50.0,
    int_scale: float = 32768.0,
) -> list[list[int]]:
    """Silent [start_ms, end_ms] ranges, pydub.silence.detect_silence parity.

    x: float samples in [-1,1). silence_thresh in dBFS.
    """
    length_ms = int(len(x) * 1000 // rate)
    if length_ms < min_silence_len:
        return []
    n_starts = max(length_ms - min_silence_len + 1, 0)
    # The window scan is memory-bound host-adjacent work, not MXU work: the
    # native C++ runtime (double prefix sums, audioop-parity floor) beats
    # shipping the whole signal to a device — on remote/tunneled backends
    # the transfer alone dwarfs the math. Device path kept as fallback.
    from ..utils import native_audio

    if int_scale == 32768.0 and not isinstance(x, jnp.ndarray) and native_audio.available():
        win_rms = native_audio.window_rms(np.asarray(x, np.float32), rate, min_silence_len)
        if win_rms is not None:
            win_rms = np.asarray(win_rms[:n_starts])
            return _silent_runs(win_rms, silence_thresh, int_scale, min_silence_len)
    # pad to a power-of-two bucket so arbitrary clip lengths reuse ONE
    # compiled program (a fresh compile per length cost seconds per clip in
    # the whisper-aligner VAD). The prefix of the padded cumsum is
    # bit-identical, and every original window ends before the pad, so
    # slicing to the original start count reproduces the unpadded result
    # exactly.
    T = int(len(x))
    Tp = 1 << max(T - 1, 1).bit_length()
    xp = np.pad(np.asarray(x), (0, Tp - T)) if Tp != T else np.asarray(x)
    if xp.dtype == np.float32:
        from .pcm import f32_to_i16_exact

        q = f32_to_i16_exact(xp)
        if q is not None:
            xp = q  # lossless halved transfer
    ms2 = np.asarray(_window_rms_sq(jnp.asarray(xp), rate, min_silence_len))[:n_starts]
    # pydub: audioop integer rms <= db_to_float(thresh) * max_amplitude
    win_rms = np.floor(np.sqrt(np.maximum(ms2, 0.0)) * int_scale)
    return _silent_runs(win_rms, silence_thresh, int_scale, min_silence_len)


def _silent_runs(
    win_rms: np.ndarray, silence_thresh: float, int_scale: float, min_silence_len: int
) -> list[list[int]]:
    """Threshold per-ms window RMS and merge into pydub-parity silent ranges."""
    thresh_lin = (10.0 ** (silence_thresh / 20.0)) * int_scale
    silent = win_rms <= thresh_lin

    starts = np.nonzero(silent)[0]
    if starts.size == 0:
        return []
    ranges: list[list[int]] = []
    range_start = int(starts[0])
    prev = int(starts[0])
    for s in starts[1:]:
        s = int(s)
        continuous = s == prev + 1
        has_gap = s > prev + min_silence_len
        if not continuous and has_gap:
            ranges.append([range_start, prev + min_silence_len])
            range_start = s
        prev = s
    ranges.append([range_start, prev + min_silence_len])
    return ranges


def detect_nonsilent(
    x: np.ndarray, rate: int, min_silence_len: int = 1000, silence_thresh: float = -50.0
) -> list[list[int]]:
    length_ms = int(len(x) * 1000 // rate)
    silent = detect_silence(x, rate, min_silence_len, silence_thresh)
    if not silent:
        return [[0, length_ms]]
    if silent == [[0, length_ms]]:
        return []
    out = []
    prev_end = 0
    for s, e in silent:
        if s > prev_end:
            out.append([prev_end, s])
        prev_end = e
    if prev_end < length_ms:
        out.append([prev_end, length_ms])
    if out and out[0] == [0, 0]:
        out.pop(0)
    return out


def split_on_silence_ranges(
    x: np.ndarray,
    rate: int,
    min_silence_len: int = 1000,
    silence_thresh: float = -50.0,
    keep_silence: int = 300,
) -> list[tuple[int, int]]:
    """[start_ms, end_ms) chunk ranges of pydub.silence.split_on_silence
    (Code/Preprocessing/preprocess_audio.py:41-46 uses the audio of each)."""
    length_ms = int(len(x) * 1000 // rate)
    nonsilent = detect_nonsilent(x, rate, min_silence_len, silence_thresh)
    # pydub pads first, splits overlaps at the midpoint, and clamps only
    # when slicing — order matters for the midpoint arithmetic
    ranges = [[s - keep_silence, e + keep_silence] for s, e in nonsilent]
    for cur, nxt in zip(ranges[:-1], ranges[1:]):
        if nxt[0] < cur[1]:
            mid = (cur[1] + nxt[0]) // 2
            cur[1] = mid
            nxt[0] = mid
    return [(max(s, 0), min(e, length_ms)) for s, e in ranges]
