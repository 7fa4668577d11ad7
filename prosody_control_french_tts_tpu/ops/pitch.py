"""Boersma (1993) autocorrelation pitch tracking, batched for TPU.

This is the framework's flagship DSP kernel: a from-scratch JAX
implementation of the algorithm behind Praat's ``Sound: To Pitch (ac)``,
which the reference calls through parselmouth with ``pitch_floor=150,
pitch_ceiling=600`` for every segment and every syntagme slice
(Code/audioPipeline.py:326-335, Code/Pipeline/compute_pitch_adjustments.py:190-199).

Differences from a C translation — this is designed for XLA/TPU:

- all frames of a whole segment batch are processed at once:
  frame extraction is one gather, windowing/normalisation are fused
  elementwise ops, the autocorrelation is one batched real FFT
  (MXU/VPU-friendly), and candidate selection is a vectorised top-k;
- the Viterbi path over frames is a single ``lax.scan`` with a
  [num_candidates × num_candidates] transition matrix per step;
- no data-dependent shapes: candidate lists are fixed-width (15, like
  Praat's ``maxnCandidates``) with masking.

Algorithm stages (matching the published algorithm + Praat semantics):

1. frames centred symmetrically over the signal:
   ``n_frames = floor((dur - window_dur)/dt) + 1``;
2. per frame: subtract the local mean (±1 longest period around the
   centre), multiply by a Hanning window;
3. normalised autocorrelation ``r(τ) = (ac_x(τ)/ac_x(0)) / (ac_w(τ)/ac_w(0))``
   via zero-padded FFT, where ``ac_w`` is the window's own autocorrelation;
4. voiced candidates: local maxima of r(τ) for τ ∈ (2 samples, window/3),
   parabolic-interpolated and refined by Newton steps on a truncated-sinc
   interpolant; strength > 1 folded as 1/strength; the strongest
   ``max_candidates-1`` kept;
5. unvoiced candidate strength from the frame's local/global peak ratio;
6. Viterbi over frames with octave cost, octave-jump cost and
   voiced/unvoiced transition cost (scaled by ``dt/0.01``).

The reference's number (median F0 over voiced frames of a time window) is
provided by ``median_pitch_in_windows``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache as _lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class PitchParams:
    floor: float = 150.0  # Code/audioPipeline.py:329
    ceiling: float = 600.0
    time_step: float | None = None  # None → 0.75/floor (Praat default)
    max_candidates: int = 15
    silence_threshold: float = 0.03
    voicing_threshold: float = 0.45
    octave_cost: float = 0.01
    octave_jump_cost: float = 0.35
    voiced_unvoiced_cost: float = 0.14
    periods_per_window: float = 3.0
    sinc_refine_steps: int = 0  # Newton steps on the windowed-sinc interpolant
    # (0 = parabolic only; measured ≤4e-4 relative error on synthetic tones,
    # see tests/test_pitch.py — within the 1e-3 parity budget)
    sinc_half_width: int = 16


@dataclass
class PitchTrack:
    f0: jnp.ndarray  # [..., F] Hz, 0.0 = unvoiced
    times: np.ndarray  # [F] frame centres in seconds
    dt: float


# ---------------------------------------------------------------------------
# static geometry (host side — shapes must be Python ints for jit)
# ---------------------------------------------------------------------------


def _geometry(num_samples: int, sr: float, p: PitchParams):
    dt = p.time_step if p.time_step is not None else 0.75 / p.floor
    dx = 1.0 / sr
    duration = num_samples * dx
    window_dur = p.periods_per_window / p.floor
    nsamp_window = int(math.floor(window_dur / dx))
    half_window = nsamp_window // 2 - 1
    nsamp_window = half_window * 2
    nsamp_period = int(math.floor(sr / p.floor))
    half_period = nsamp_period // 2 + 1
    n_frames = max(1, int(math.floor((duration - window_dur) / dt)) + 1)
    mid_time = duration / 2.0
    first_time = mid_time - 0.5 * (n_frames - 1) * dt
    max_lag = min(int(math.floor(nsamp_window / p.periods_per_window)) + 2, nsamp_window // 2)
    min_lag = max(2, int(math.ceil(sr / p.ceiling)) - 1)
    nfft = 1
    while nfft < nsamp_window * 2:
        nfft *= 2
    return dict(
        dt=dt,
        dx=dx,
        nsamp_window=nsamp_window,
        half_window=half_window,
        nsamp_period=nsamp_period,
        half_period=half_period,
        n_frames=n_frames,
        first_time=first_time,
        max_lag=max_lag,
        min_lag=min_lag,
        nfft=nfft,
    )


def _hanning(n: int) -> np.ndarray:
    j = np.arange(1, n + 1, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * j / (n + 1))).astype(np.float32)


@_lru_cache(maxsize=8)
def _cos_lag_matrix(nfft: int, n_lags: int) -> np.ndarray:
    """irfft restricted to the first n_lags outputs, as a [nfft/2+1, n_lags]
    cosine matrix: ac[τ] = Σ_k w_k·P[k]·cos(2πkτ/nfft)/nfft (w = 2 except
    DC/Nyquist)."""
    k = np.arange(nfft // 2 + 1, dtype=np.float64)
    tau = np.arange(n_lags, dtype=np.float64)
    C = np.cos(2.0 * np.pi * np.outer(k, tau) / nfft) / nfft
    C[1:-1] *= 2.0
    return C.astype(np.float32)


# Spectrum implementation switch: "dft_mxu" computes the power spectrum and
# the lag-restricted inverse transform as dense DFT matmuls on the MXU,
# "rfft" uses the FFT; "auto" picks dft_mxu on TPU (measured floor-free on
# v5e at the corpus bucket shape [23575, 880]: rfft+cosmat 12.2 ms vs
# bf16x3-DFT 1.2 ms — XLA's TPU FFT cannot touch the systolic array) and
# rfft elsewhere (CPU FFT beats dense matmuls at these sizes).
# NOTE: read at TRACE time (same caveat as loudness.KWEIGHT_IMPL) — a flip
# after compilation is a silent no-op until _pitch_frames.clear_cache().
SPECTRUM_IMPL = "auto"


def _spectrum_mode() -> str:
    if SPECTRUM_IMPL != "auto":
        return SPECTRUM_IMPL
    return "dft_mxu" if jax.default_backend() == "tpu" else "rfft"


@_lru_cache(maxsize=8)
def _dft_lag_matrices(W: int, n_lags: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Dense DFT operators for the MXU autocorrelation path.

    Any transform length ≥ W + n_lags makes the circular correlation
    linear; a matmul needs no power-of-two, so the length is the smallest
    lane-aligned multiple of 256 — ~40 % fewer bins than the rfft path's
    next_pow2(2W). Returns (Dc [W,K], Ds [W,K], M [K,n_lags], nfft_m),
    all computed in float64 and rounded once to float32."""
    nfft_m = ((W + n_lags + 255) // 256) * 256
    K = nfft_m // 2 + 1
    j = np.arange(W, dtype=np.float64)
    k = np.arange(K, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(j, k) / nfft_m
    Dc = np.cos(ang).astype(np.float32)
    Ds = np.sin(ang).astype(np.float32)
    tau = np.arange(n_lags, dtype=np.float64)
    M = np.cos(2.0 * np.pi * np.outer(k, tau) / nfft_m) / nfft_m
    M[1:-1] *= 2.0
    return Dc, Ds, M.astype(np.float32), nfft_m


@_lru_cache(maxsize=8)
def _window_ac_ratio(W: int, n_lags: int) -> np.ndarray:
    """ac_w(τ)/ac_w(0) of the Hanning analysis window, float64-exact (the
    window is static per geometry, so this never needs device work)."""
    win = _hanning(W).astype(np.float64)
    nfft = 1
    while nfft < W + n_lags:
        nfft *= 2
    ac = np.fft.irfft(np.abs(np.fft.rfft(win, n=nfft)) ** 2)[:n_lags]
    return (ac / ac[0]).astype(np.float32)


# 3-pass split-precision MXU matmul (ops.precision): ~16 mantissa bits —
# measured ≤6e-4 of ac(0) on the corpus spectrum vs float64 (the DFT
# contraction is well-conditioned), inside the 1e-3 Praat-parity budget,
# at ~1/6 the cost of XLA's HIGHEST-precision f32 emulation.
from .precision import mm_split3 as _mm_split3  # noqa: E402


# ---------------------------------------------------------------------------
# jitted core
# ---------------------------------------------------------------------------


def _frame_matrix(x: jnp.ndarray, starts: jnp.ndarray, width: int) -> jnp.ndarray:
    """Gather [F, width] windows from x at integer start indices."""
    idx = starts[:, None] + jnp.arange(width)[None, :]
    idx = jnp.clip(idx, 0, x.shape[-1] - 1)
    return jnp.take(x, idx, axis=-1)


def _affine_frame_classes(g: dict, num_samples: int) -> dict | None:
    """Frame starts are affine: start_i = floor(α + β·i) + 1 − half_window
    with β = dt/dx. When β·q is integer for a small q, frames split into q
    classes of EXACT integer stride — each class extractable by reshape
    over contiguous memory (overlap framing), replacing the [F, W] gather
    that dominates the kernel's runtime on TPU (measured 0.22 s of 0.5 s
    at S=10). Returns None when no small q exists (gather fallback)."""
    beta = g["dt"] / g["dx"]
    q = None
    for cand in (1, 2, 4, 5, 8, 10, 16, 20):
        if abs(beta * cand - round(beta * cand)) < 1e-6:
            q = cand
            break
    if q is None:
        return None
    stride = int(round(beta * q))
    if stride <= 0:
        return None
    alpha0 = g["first_time"] / g["dx"] - 0.5
    F = g["n_frames"]
    Fp = ((F + q - 1) // q) * q  # pad to full classes
    n_per = Fp // q
    W = g["nsamp_window"]
    m = -(-W // stride) + 1  # chunks per frame
    starts0 = [int(math.floor(alpha0 + beta * p)) + 1 - g["half_window"] for p in range(q)]
    # room needed past the last padded frame's start
    need = max(s0 + stride * (n_per - 1 + m) for s0 in starts0) + 1
    return dict(q=q, stride=stride, n_per=n_per, m=m, starts0=starts0, pad_to=max(need, num_samples), F=F, Fp=Fp, W=W)


def _frames_uniform(x: jnp.ndarray, cls: dict) -> jnp.ndarray:
    """Reshape-based overlap framing per stride class, interleaved back to
    frame order. x must already be zero-padded to cls['pad_to']."""
    stride, n_per, m, W = cls["stride"], cls["n_per"], cls["m"], cls["W"]
    per_class = []
    for s0 in cls["starts0"]:
        s0c = max(s0, 0)  # first frame can start at −1 in Praat's indexing
        xs = jax.lax.dynamic_slice_in_dim(x, s0c, stride * (n_per - 1 + m), axis=-1)
        chunks = xs.reshape(n_per - 1 + m, stride)
        rows = jnp.concatenate([chunks[j : j + n_per] for j in range(m)], axis=-1)[:, :W]
        if s0 < 0:  # shift the affected first frame's content
            rows = rows.at[0].set(jnp.concatenate([jnp.zeros(-s0, x.dtype), rows[0][: W + s0]]))
        per_class.append(rows)
    inter = jnp.stack(per_class, axis=1).reshape(cls["Fp"], W)
    return inter[: cls["F"]]


def _sinc_refine(r: jnp.ndarray, lag0: jnp.ndarray, steps: int, half: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Newton refinement of a local maximum of the band-limited interpolant
    r(τ) = Σ_i r[i]·sinc(τ−i), truncated to ±half samples around the peak.

    Praat refines candidates with depth-70 sinc interpolation via Brent
    search; a couple of Newton iterations on the same interpolant from the
    parabolic initialiser converges to the identical extremum for the smooth
    autocorrelation sequences seen here.
    """
    n = r.shape[-1]
    base = jnp.clip(jnp.round(lag0).astype(jnp.int32), half, n - half - 1)
    offs = jnp.arange(-half, half + 1)
    neigh = jnp.take_along_axis(
        jnp.broadcast_to(r, lag0.shape + (n,)), (base[..., None] + offs), axis=-1
    )  # [..., 2*half+1]
    i = base[..., None].astype(jnp.float32) + offs.astype(jnp.float32)
    M = float(half + 1)  # Hann taper width (Praat's NUMinterpolate_sinc)

    def value_and_derivs(tau):
        u = tau[..., None] - i
        z = jnp.pi * u
        z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        s = jnp.sin(z) / z
        ds = (jnp.cos(z) - s) / z * jnp.pi  # d sinc/du
        d2s = (-jnp.sin(z) * jnp.pi - 2.0 * ds) / z * jnp.pi
        a = jnp.pi / M
        w = 0.5 * (1.0 + jnp.cos(a * u))
        dw = -0.5 * a * jnp.sin(a * u)
        d2w = -0.5 * a * a * jnp.cos(a * u)
        k = s * w
        dk = ds * w + s * dw
        d2k = d2s * w + 2.0 * ds * dw + s * d2w
        f = jnp.sum(neigh * k, axis=-1)
        d1 = jnp.sum(neigh * dk, axis=-1)
        d2 = jnp.sum(neigh * d2k, axis=-1)
        return f, d1, d2

    tau = lag0
    for _ in range(steps):
        _, d1, d2 = value_and_derivs(tau)
        step = jnp.where(jnp.abs(d2) > 1e-12, -d1 / d2, 0.0)
        step = jnp.clip(step, -1.0, 1.0)
        tau = jnp.clip(tau + step, lag0 - 1.0, lag0 + 1.0)
    val, _, _ = value_and_derivs(tau)
    return tau, val


@partial(jax.jit, static_argnames=("sr", "num_samples", "p"))
def _pitch_frames(x: jnp.ndarray, sr: float, num_samples: int, p: PitchParams, length=None):
    """Per-frame candidate extraction. x: [T] float32 (padded to num_samples,
    zeros past ``length`` samples; ``length`` None → whole buffer is real).

    Returns (freq [F,K], strength [F,K], intensity [F], frame_valid [F]);
    candidate 0 is the unvoiced candidate (freq 0, strength 0 — its Viterbi
    strength is computed from intensity in the path finder).
    """
    g = _geometry(num_samples, sr, p)
    F, W = g["n_frames"], g["nsamp_window"]
    K = p.max_candidates

    x = x.astype(jnp.float32)
    if length is None:
        length = jnp.float32(num_samples)
    else:
        length = jnp.asarray(length, jnp.float32)
    sample_valid = jnp.arange(num_samples) < length
    mean = jnp.sum(x) / jnp.maximum(length, 1.0)
    global_peak = jnp.max(jnp.where(sample_valid, jnp.abs(x - mean), 0.0)) + 1e-30

    centers = g["first_time"] + jnp.arange(F) * g["dt"]  # seconds
    cls = _affine_frame_classes(g, num_samples)
    if cls is not None:
        # exact rational frame grid: start_i = starts0[i%q] + stride*(i//q).
        # Float accumulation of centres drifts +-1 sample at floor
        # boundaries; the rational grid is the definition here and feeds
        # frames, local means and peaks consistently.
        i_arr = jnp.arange(F)
        s0 = jnp.asarray(cls["starts0"], jnp.int32)
        frame_start = s0[i_arr % cls["q"]] + cls["stride"] * (i_arr // cls["q"])
        left = frame_start + g["half_window"] - 1
    else:
        # 0-based index of Praat's "leftSample": sample i covers time (i+0.5)dx
        left = jnp.floor(centers / g["dx"] - 0.5).astype(jnp.int32)
        frame_start = left + 1 - g["half_window"]

    # local mean over ±1 longest period: samples [right-P, left+P] inclusive.
    # O(1) per frame from chunked prefix sums instead of a [F, 2P] gather
    # (this gather was ~20 % of the kernel's HBM traffic).
    from .cumsum import ChunkedCumsum

    mean_w = 2 * g["nsamp_period"]
    mean_start = jnp.clip(left + 1 - g["nsamp_period"], 0, num_samples - mean_w)
    cs = ChunkedCumsum.build(x)
    local_mean = cs.range_sum(mean_start, mean_start + mean_w) / mean_w  # [F]

    # windowed, mean-subtracted frame — reshape-based overlap framing when
    # the frame stride is rational (it is for all standard rates), else
    # the gather fallback
    win = jnp.asarray(_hanning(W))
    if cls is not None:
        xp = jnp.pad(x, (0, cls["pad_to"] - num_samples)) if cls["pad_to"] > num_samples else x
        raw_frames = _frames_uniform(xp, cls)
    else:
        raw_frames = _frame_matrix(x, frame_start, W)
    frames = (raw_frames - local_mean[:, None]) * win[None, :]

    # local peak: centre ± half period of the *windowed* frame
    j = jnp.arange(W)
    lp_lo = jnp.maximum(g["half_window"] - g["half_period"], 0)
    lp_hi = jnp.minimum(g["half_window"] + g["half_period"], W) - 1
    lp_mask = (j >= lp_lo) & (j <= lp_hi)
    local_peak = jnp.max(jnp.abs(frames) * lp_mask[None, :], axis=-1)
    intensity = jnp.minimum(local_peak / global_peak, 1.0)

    # normalised autocorrelation, restricted to the needed max_lag+2 lags.
    # On TPU the whole transform runs as three dense DFT matmuls on the
    # MXU (power spectrum = (x·Dc)² + (x·Ds)², lag-restricted inverse =
    # ·M), each a 3-pass bf16 split — 10.7× faster than the rfft+cosmat
    # formulation at the corpus bucket shape (floor-free measurement:
    # 12.2 ms → 1.2 ms for [23575, 880]). Off-TPU the rfft path remains.
    # The window's own autocorrelation ratio is a host-side float64
    # constant (it only depends on the static geometry).
    L_out = g["max_lag"] + 2
    if _spectrum_mode() == "dft_mxu":
        Dc, Ds, M, _ = _dft_lag_matrices(W, L_out)
        u = _mm_split3(frames, jnp.asarray(Dc))
        v = _mm_split3(frames, jnp.asarray(Ds))
        ac = _mm_split3(u * u + v * v, jnp.asarray(M))
    else:
        nfft = g["nfft"]
        spec_pow = jnp.abs(jnp.fft.rfft(frames, n=nfft, axis=-1)) ** 2
        ac = spec_pow @ jnp.asarray(_cos_lag_matrix(nfft, L_out))
    acw_ratio = jnp.asarray(_window_ac_ratio(W, L_out))
    r = (ac / (ac[:, :1] + 1e-30)) / acw_ratio[None, :]  # [F, L+2]

    # voiced candidates: local maxima of r in (min_lag, max_lag).
    # On a single TPU the whole stage (local maxima → top-k → parabolic)
    # runs as one VMEM-resident Pallas pass (ops.pallas_kernels.
    # topk_parabolic — the XLA formulation below re-reads the [F, L]
    # tensor from HBM every top-k round: measured 104 ms of the 240 ms
    # measure program at the corpus shape, vs ~2 ms fused). Multi-device
    # GSPMD programs keep the XLA path (pallas_call has no partitioning
    # rule — same dispatch rule as viterbi_batched). Backend is read at
    # TRACE time (same caveat as SPECTRUM_IMPL).
    L = g["max_lag"] + 2
    if p.sinc_refine_steps == 0 and jax.default_backend() == "tpu" and len(jax.devices()) == 1:
        from .pallas_kernels import topk_parabolic

        lag_f, strength, valid = topk_parabolic(
            r, K - 1, g["min_lag"], g["max_lag"], p.voicing_threshold
        )
    else:
        lag_idx = jnp.arange(L)
        interior = (lag_idx >= g["min_lag"]) & (lag_idx < g["max_lag"])
        r_m1 = jnp.concatenate([r[:, :1], r[:, :-1]], axis=-1)
        r_p1 = jnp.concatenate([r[:, 1:], r[:, -1:]], axis=-1)
        is_max = (r > r_m1) & (r >= r_p1) & (r > 0.5 * p.voicing_threshold) & interior[None, :]
        score = jnp.where(is_max, r, -jnp.inf)
        top_val, top_lag = _top_k(score, K - 1)  # [F, K-1]
        valid = jnp.isfinite(top_val)

        # parabolic interpolation around each selected lag
        safe_lag = jnp.clip(top_lag, 1, L - 2)
        rv = jnp.take_along_axis(r, safe_lag, axis=-1)
        rl = jnp.take_along_axis(r, safe_lag - 1, axis=-1)
        rr = jnp.take_along_axis(r, safe_lag + 1, axis=-1)
        dr = 0.5 * (rr - rl)
        d2r = 2.0 * rv - rl - rr
        offset = jnp.where(jnp.abs(d2r) > 1e-12, dr / d2r, 0.0)
        lag_est = safe_lag.astype(jnp.float32) + jnp.clip(offset, -1.0, 1.0)

        if p.sinc_refine_steps > 0:
            ref_lag, ref_val = jax.vmap(
                lambda rf, lf: _sinc_refine(rf, lf, p.sinc_refine_steps, p.sinc_half_width)
            )(r, lag_est)
            lag_f = ref_lag
            strength = ref_val
        else:
            lag_f = lag_est
            strength = rv + 0.5 * dr * offset  # parabolic peak value

    freq = sr / jnp.maximum(lag_f, 1e-6)
    strength = jnp.where(strength > 1.0, 1.0 / jnp.maximum(strength, 1e-30), strength)
    freq = jnp.where(valid, freq, 0.0)
    strength = jnp.where(valid, strength, 0.0)

    # frames whose analysis window spills past the true signal end are
    # forced unvoiced (they do not exist in an exact-length analysis)
    frame_valid = (centers + 0.5 * W * g["dx"]) <= (length * g["dx"] + 1e-6)
    freq = jnp.where(frame_valid[:, None], freq, 0.0)
    strength = jnp.where(frame_valid[:, None], strength, 0.0)
    intensity = jnp.where(frame_valid, intensity, 0.0)

    # prepend the unvoiced candidate
    freq = jnp.concatenate([jnp.zeros((F, 1), freq.dtype), freq], axis=-1)
    strength = jnp.concatenate([jnp.zeros((F, 1), strength.dtype), strength], axis=-1)
    return freq, strength, intensity, frame_valid


def _top_k(score: jnp.ndarray, k: int, force: str | None = None):
    """top-k along the last axis with lax.top_k semantics (descending,
    first index on ties). On TPU, k rounds of masked argmax beat the
    top_k lowering for small k over a few hundred lags (k passes of
    cheap VPU reductions instead of a sort network); off-TPU lax.top_k
    stays. Both produce identical results — argmax and top_k share the
    first-index tie rule. ``force`` ("lax" | "iter") overrides the
    backend dispatch (tests exercise the TPU branch on CPU with it)."""
    use_iter = force == "iter" if force else (jax.default_backend() == "tpu" and k <= 16)
    if not use_iter:
        return jax.lax.top_k(score, k)
    lanes = jnp.arange(score.shape[-1])
    taken = jnp.zeros(score.shape, bool)
    vals, idxs = [], []
    for _ in range(k):
        cur = jnp.where(taken, -jnp.inf, score)
        i = jnp.argmax(cur, axis=-1)
        v = jnp.take_along_axis(cur, i[..., None], axis=-1)[..., 0]
        # rows with fewer than k finite entries: argmax over an all(-inf)
        # residue always lands on lane 0, which may already be taken — fall
        # back to the first untaken lane so indices stay distinct (the
        # lax.top_k contract: -inf duplicates come out in index order)
        first_untaken = jnp.argmax(~taken, axis=-1)
        i = jnp.where(jnp.isfinite(v), i, first_untaken).astype(jnp.int32)
        v = jnp.take_along_axis(cur, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i)
        taken = taken | (lanes == i[..., None])
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1).astype(jnp.int32)


def _viterbi_inputs(freq, strength, intensity, p: PitchParams, dt: float):
    time_step_correction = dt / 0.01
    vuv_cost = p.voiced_unvoiced_cost * time_step_correction
    jump_cost = p.octave_jump_cost * time_step_correction

    voiced = (freq > 0.0) & (freq <= p.ceiling)
    unvoiced_strength = p.voicing_threshold + jnp.maximum(
        0.0, 2.0 - intensity * (1.0 + p.voicing_threshold) / p.silence_threshold
    )  # [F]
    delta = jnp.where(
        voiced,
        strength - p.octave_cost * jnp.log2(p.ceiling / jnp.maximum(freq, 1e-6)),
        unvoiced_strength[:, None],
    )  # [F, K]
    return delta, voiced, vuv_cost, jump_cost


@partial(jax.jit, static_argnames=("p", "dt"))
def _viterbi_sequential(freq: jnp.ndarray, strength: jnp.ndarray, intensity: jnp.ndarray, p: PitchParams, dt: float):
    """Praat's Pitch path finder as a lax.scan (reference implementation;
    the parallel max-plus version below is the production path —
    tests assert both produce the same track). freq/strength: [F, K]."""
    delta, voiced, vuv_cost, jump_cost = _viterbi_inputs(freq, strength, intensity, p, dt)
    safe_f = jnp.maximum(freq, 1e-6)

    def trans_cost(f_prev, v_prev, f_cur, v_cur):
        both_v = v_prev[:, None] & v_cur[None, :]
        neither = (~v_prev[:, None]) & (~v_cur[None, :])
        jump = jump_cost * jnp.abs(jnp.log2(f_prev[:, None] / f_cur[None, :]))
        return jnp.where(neither, 0.0, jnp.where(both_v, jump, vuv_cost))

    def step(carry, inp):
        psi_prev, f_prev, v_prev = carry
        d_cur, f_cur, v_cur = inp
        cost = trans_cost(f_prev, v_prev, f_cur, v_cur)  # [K, K]
        total = psi_prev[:, None] - cost  # maximise
        best_prev = jnp.argmax(total, axis=0)  # [K]
        psi = jnp.max(total, axis=0) + d_cur
        return (psi, f_cur, v_cur), best_prev

    init = (delta[0], safe_f[0], voiced[0])
    (psi_last, _, _), back = jax.lax.scan(
        step, init, (delta[1:], safe_f[1:], voiced[1:])
    )  # back: [F-1, K]
    last = jnp.argmax(psi_last, axis=-1)

    def backtrack(carry, ptr_row):
        nxt = carry
        prev = ptr_row[nxt]
        return prev, nxt

    # back[t] maps frame-(t+1) candidates to their best frame-t predecessor.
    # Walk backwards: outputs are the chosen indices at frames F-1..1, the
    # final carry is the index at frame 0.
    first, path_rev = jax.lax.scan(backtrack, last, back[::-1])
    path = jnp.concatenate([first[None], path_rev[::-1]], axis=0)

    f0 = jnp.take_along_axis(freq, path[:, None], axis=-1)[:, 0]
    v = jnp.take_along_axis(voiced, path[:, None], axis=-1)[:, 0]
    return jnp.where(v, f0, 0.0)


@partial(jax.jit, static_argnames=("p", "dt"))
def _viterbi_parallel(freq: jnp.ndarray, strength: jnp.ndarray, intensity: jnp.ndarray, p: PitchParams, dt: float):
    """Parallel Viterbi in the (max, +) semiring.

    The sequential scan costs one device step per frame (~10⁴ steps per
    segment — the dominant cost of the whole measure program on TPU).
    Dynamic programming over a fixed candidate set is a max-plus
    matrix chain, which is associative, so:

    - build per-frame transition matrices M_t[j, k] = −cost(j→k) + δ_t[k];
    - prefix max-plus products via ``lax.associative_scan`` (log₂F depth,
      [F, K, K] elementwise work — VPU-parallel);
    - suffix products likewise (reverse=True) give the best-future score
      β_t[k]; the optimal path is then argmax_k(α_t[k] + β_t[k]) *per
      frame independently* — no sequential backtrack at all.
    """
    delta, voiced, vuv_cost, jump_cost = _viterbi_inputs(freq, strength, intensity, p, dt)
    F, K = delta.shape
    safe_f = jnp.maximum(freq, 1e-6)

    # transition cost between frame t-1 (axis j) and frame t (axis k):
    v_prev = voiced[:-1][:, :, None]
    v_cur = voiced[1:][:, None, :]
    jump = jump_cost * jnp.abs(
        jnp.log2(safe_f[:-1][:, :, None] / safe_f[1:][:, None, :])
    )
    cost = jnp.where(
        (~v_prev) & (~v_cur), 0.0, jnp.where(v_prev & v_cur, jump, vuv_cost)
    )  # [F-1, K, K]
    M = -cost + delta[1:][:, None, :]  # [F-1, K, K]

    NEG = jnp.float32(-1e30)

    def combine(a, b):
        # max-plus product along the chain: (a ⊗ b)[j,k] = max_m a[j,m]+b[m,k].
        # Two float32 guards, both argmax-preserving:
        # - renormalise by the matrix max (a uniform shift): raw scores grow
        #   ~2.5/frame and rounding at |score|≈10⁴ would corrupt millicost
        #   decisions;
        # - clamp entries at −CLAMP: a state influences the path only
        #   through one transition (≤~0.5) plus one frame's delta spread
        #   (≤~4), so an entry lagging the block max by ≥8 can never be on
        #   the optimum; clamping bounds the dynamic range so rounding
        #   stays ~1e-6.
        r = jnp.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)
        r = r - jnp.max(r, axis=(-2, -1), keepdims=True)
        return jnp.maximum(r, -32.0)

    if F == 1:
        best = jnp.argmax(delta, axis=-1)
        f0 = jnp.take_along_axis(freq, best[:, None], axis=-1)[:, 0]
        v = jnp.take_along_axis(voiced, best[:, None], axis=-1)[:, 0]
        return jnp.where(v, f0, 0.0)

    prefix = jax.lax.associative_scan(combine, M, axis=0)  # P_t = M_1⊗…⊗M_t
    alpha = jnp.concatenate(
        [delta[:1], jnp.max(delta[0][None, :, None] + prefix, axis=1)], axis=0
    )  # [F, K]
    # suffix products M_t⊗…⊗M_{F-1}: max-plus matmul is non-commutative, so
    # a reverse=True scan (which feeds combine in flipped order) is wrong;
    # use (A⊗B)ᵀ = Bᵀ⊗Aᵀ — scan the transposed, order-reversed chain and
    # transpose back.
    Mt_rev = jnp.swapaxes(M, -1, -2)[::-1]
    suffix_t = jax.lax.associative_scan(combine, Mt_rev, axis=0)
    suffix = jnp.swapaxes(suffix_t, -1, -2)[::-1]
    beta = jnp.concatenate(
        [jnp.max(suffix, axis=2), jnp.zeros((1, K), delta.dtype)], axis=0
    )  # [F, K]

    path = jnp.argmax(alpha + beta, axis=-1)  # [F]
    f0 = jnp.take_along_axis(freq, path[:, None], axis=-1)[:, 0]
    v = jnp.take_along_axis(voiced, path[:, None], axis=-1)[:, 0]
    return jnp.where(v, f0, 0.0)


# Production dispatch: the associative-scan (max,+) version on TPU, the
# tiny-state lax.scan off it. Floor-free on-device repetition at the corpus
# bucket shape ([5, 4715, 15] tracks, v5e) measures the parallel version at
# 13.9 ms vs 43.9 ms sequential — ~10⁴ sequential scan steps cost far more
# than log₂F passes of [F,K,K] VPU work. (An earlier measurement claiming
# the opposite was polluted by the remote runtime's ~30 ms per-launch
# latency floor.) Both are exact; tests assert equal tracks.
def _viterbi(freq, strength, intensity, p: PitchParams, dt: float):
    if jax.default_backend() == "tpu":
        return _viterbi_parallel(freq, strength, intensity, p, dt)
    return _viterbi_sequential(freq, strength, intensity, p, dt)


def viterbi_batched(freq, strength, intensity, p: PitchParams, dt: float):
    """Batched path finder over [S, F, K] tracks — the production entry.

    On TPU this is the Pallas kernel (ops.viterbi_pallas): the whole DP
    state lives in VMEM, one HBM pass per direction, and cost is constant
    in S up to 16 segments per call (measured 13.6 ms vs 17.0 ms for the
    vmapped associative scan at [5, 4715, 15] — and the gap widens with
    batch size, since the scan's [F,K,K] HBM traffic is linear in S).
    Off-TPU the tiny-state sequential scan wins and keeps bit-exact CPU
    goldens. Multi-device programs (parallel.measure_sharded under GSPMD)
    use the associative scan instead: it partitions along S automatically,
    while a pallas_call has no SPMD partitioning rule."""
    if jax.default_backend() == "tpu" and len(jax.devices()) == 1:
        from .viterbi_pallas import SUB, viterbi_pallas_batched

        S = freq.shape[0]
        outs = [
            viterbi_pallas_batched(
                freq[i : i + SUB], strength[i : i + SUB], intensity[i : i + SUB], p, dt
            )
            for i in range(0, S, SUB)
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return jax.vmap(lambda f, s, i: _viterbi(f, s, i, p, dt))(freq, strength, intensity)


def praat_pitch(
    x: np.ndarray | jnp.ndarray,
    sr: float,
    params: PitchParams | None = None,
    lengths: np.ndarray | jnp.ndarray | None = None,
) -> PitchTrack:
    """Full pitch track of a mono signal. Accepts [T] or batched [B, T].

    For ragged batches, pad with zeros to a common T and pass per-row true
    sample counts in ``lengths``: frames past a row's end come out unvoiced
    and the silence/voicing thresholds use only the row's real samples.
    """
    p = params or PitchParams()
    x = jnp.asarray(x, dtype=jnp.float32)
    batched = x.ndim == 2
    num_samples = int(x.shape[-1])
    g = _geometry(num_samples, sr, p)

    if batched:
        if lengths is None:
            lengths = jnp.full((x.shape[0],), num_samples, jnp.float32)
        freq, strength, intensity, _ = jax.vmap(
            lambda sig, length: _pitch_frames(sig, sr, num_samples, p, length)
        )(x, jnp.asarray(lengths, jnp.float32))
        f0 = viterbi_batched(freq, strength, intensity, p, g["dt"])
    else:
        length = None if lengths is None else jnp.asarray(lengths, jnp.float32)
        freq, strength, intensity, _ = _pitch_frames(x, sr, num_samples, p, length)
        f0 = _viterbi(freq, strength, intensity, p, g["dt"])
    times = g["first_time"] + np.arange(g["n_frames"]) * g["dt"]
    return PitchTrack(f0=f0, times=times, dt=g["dt"])


def _f32_sortable_bits(x: jnp.ndarray) -> jnp.ndarray:
    """float32 → uint32 whose unsigned order equals the float total order
    (negatives bit-complemented, positives sign-flipped)."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    neg = b >> 31 == 1
    return jnp.where(neg, ~b, b | jnp.uint32(0x80000000))


def _bits_to_f32(u: jnp.ndarray) -> jnp.ndarray:
    neg = u >> 31 == 0
    b = jnp.where(neg, ~u, u & jnp.uint32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _masked_kth_bits(u: jnp.ndarray, mask: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Exact k-th (0-based) smallest masked element of u [..., F] per row,
    by 32-round MSB-first binary search on the value bits: the smallest v
    with count(u ≤ v) ≥ k+1 — no sort, 32 cheap masked reductions."""
    v = jnp.zeros(u.shape[:-1], jnp.uint32)
    for b in range(31, -1, -1):
        cand = v | jnp.uint32((1 << b) - 1)
        cnt = jnp.sum(mask & (u <= cand[..., None]), axis=-1)
        v = jnp.where(cnt >= k + 1, v, v | jnp.uint32(1 << b))
    return v


def masked_median(values: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Median over masked entries, matching ``np.median`` (mean of the two
    middle order statistics for even counts). Returns 0 where the mask is
    empty — the reference's "no voiced frames" convention
    (Code/audioPipeline.py:335).

    On TPU the two order statistics come from an exact bitwise binary
    search (64 masked reductions) instead of ``jnp.sort`` — sorting a
    [S, N, F] window tensor is one of the measure program's slowest
    non-MXU ops. Results are identical (the search finds exact element
    values); CPU keeps the sort."""
    n = jnp.sum(mask, axis=axis)
    if jax.default_backend() == "tpu" and (axis == -1 or axis == values.ndim - 1):
        u = _f32_sortable_bits(jnp.where(mask, values, 0.0))
        lo = jnp.maximum((n - 1) // 2, 0)
        hi = jnp.maximum(n // 2, 0)
        lo_v = _bits_to_f32(_masked_kth_bits(u, mask, lo))
        hi_v = _bits_to_f32(_masked_kth_bits(u, mask, hi))
        med = 0.5 * (lo_v + hi_v)
        return jnp.where(n > 0, med, 0.0)
    big = jnp.float32(3.4e38)
    v = jnp.where(mask, values, big)
    v = jnp.sort(v, axis=axis)
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    lo_v = jnp.take_along_axis(v, lo[..., None], axis=axis)[..., 0]
    hi_v = jnp.take_along_axis(v, hi[..., None], axis=axis)[..., 0]
    med = 0.5 * (lo_v + hi_v)
    return jnp.where(n > 0, med, 0.0)


def median_pitch_in_windows(
    track: PitchTrack, windows: np.ndarray | jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Median F0 over voiced frames whose centres fall in [t0, t1).

    windows: [..., N, 2] seconds. Returns [..., N] (0.0 where no voiced
    frames — Code/audioPipeline.py:333-335 semantics).

    The reference re-runs Praat on each extracted slice; here one global
    track is sliced by frame centre, which removes the per-slice file
    re-reads flagged in SURVEY.md §6 while keeping the median within
    tolerance (frame centres differ by < dt/2 at the window edges).
    """
    windows = jnp.asarray(windows)
    t = jnp.asarray(track.times, dtype=jnp.float32)  # [F]
    f0 = track.f0  # [..., F]
    t0 = windows[..., 0][..., None]
    t1 = windows[..., 1][..., None]
    # strict upper bound — [t0, t1): adjacent syntagme windows share edges
    # (end of one == start of next), so an inclusive bound would count a
    # boundary-centred frame into BOTH medians
    in_win = (t >= t0) & (t < t1)  # [..., N, F]
    voiced = f0[..., None, :] > 0
    m = in_win & voiced
    if mask is not None:
        m = m & mask[..., None]
    vals = jnp.broadcast_to(f0[..., None, :], m.shape)
    return masked_median(vals, m, axis=-1)
