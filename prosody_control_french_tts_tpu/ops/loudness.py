"""ITU-R BS.1770-4 integrated loudness (LUFS), batched for TPU.

Replaces pyloudnorm (``pyln.Meter(rate).integrated_loudness``), which the
reference applies to every segment and every syntagme slice after
peak-normalising the raw int16 samples (Code/audioPipeline.py:338-358).

TPU-first design decisions:

- The K-weighting pre-filter (RBJ high-shelf + high-pass biquad cascade)
  is applied **in the frequency domain**: one zero-padded real FFT per
  signal, multiply by the cascade's transfer function sampled on the rfft
  grid, inverse FFT. With enough zero padding this equals scipy's
  ``lfilter`` (zero initial state) to ~1e-6 — the high-pass pole at 38 Hz
  with Q=0.5 decays in ~4 ms, far shorter than the pad — while turning a
  sequential IIR into two MXU/VPU-friendly FFTs.
- 400 ms / 75 %-overlap gating blocks are evaluated from a single cumulative
  sum of the squared K-weighted signal, so the loudness of *any* time window
  [t0, t1) is O(blocks) with no re-filtering — the reference re-reads and
  re-filters the wav once per syntagme.
- Both gates (absolute −70 LUFS, relative −10 LU) are masked reductions, so
  a whole [segments × syntagmes] matrix of windows is gated in one jit.

Numerical conventions copied from pyloudnorm for parity:
``numBlocks = round((dur − 0.4)/0.1) + 1`` (banker's rounding), block j
covers samples [int(0.4·sr·0.25·j), int(0.4·sr·(0.25·j + 1))), block power
normalised by 0.4·sr even for a truncated final block, loudness
= −0.691 + 10·log10(power); windows shorter than 400 ms are invalid
(pyloudnorm raises ValueError — callers fall back per
Code/audioPipeline.py:351-358).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

BLOCK_SECONDS = 0.4
OVERLAP = 0.75
ABS_GATE = -70.0
OFFSET = -0.691


def _rbj_high_shelf(G: float, Q: float, fc: float, rate: float):
    A = 10.0 ** (G / 40.0)
    w0 = 2.0 * math.pi * fc / rate
    alpha = math.sin(w0) / (2.0 * Q)
    c = math.cos(w0)
    b0 = A * ((A + 1) + (A - 1) * c + 2 * math.sqrt(A) * alpha)
    b1 = -2 * A * ((A - 1) + (A + 1) * c)
    b2 = A * ((A + 1) + (A - 1) * c - 2 * math.sqrt(A) * alpha)
    a0 = (A + 1) - (A - 1) * c + 2 * math.sqrt(A) * alpha
    a1 = 2 * ((A - 1) - (A + 1) * c)
    a2 = (A + 1) - (A - 1) * c - 2 * math.sqrt(A) * alpha
    return np.array([b0, b1, b2]) / a0, np.array([1.0, a1 / a0, a2 / a0])


def _rbj_high_pass(Q: float, fc: float, rate: float):
    w0 = 2.0 * math.pi * fc / rate
    alpha = math.sin(w0) / (2.0 * Q)
    c = math.cos(w0)
    b = np.array([(1 + c) / 2.0, -(1 + c), (1 + c) / 2.0])
    a = np.array([1 + alpha, -2 * c, 1 - alpha])
    return b / a[0], a / a[0]


def k_weighting_coeffs(rate: float):
    """The two BS.1770 pre-filter biquads at this sample rate (pyloudnorm's
    'K-weighting' filter class: +4 dB shelf at 1500 Hz Q=1/√2; high-pass at
    38 Hz Q=0.5)."""
    shelf = _rbj_high_shelf(4.0, 1.0 / math.sqrt(2.0), 1500.0, rate)
    hp = _rbj_high_pass(0.5, 38.0, rate)
    return shelf, hp


def _cascade_response(rate: float, nfft: int) -> np.ndarray:
    """|H(e^jw)| of the biquad cascade on the rfft grid (complex)."""
    (b1, a1), (b2, a2) = k_weighting_coeffs(rate)
    w = np.exp(-2j * np.pi * np.arange(nfft // 2 + 1) / nfft)

    def h(b, a):
        num = b[0] + b[1] * w + b[2] * w * w
        den = a[0] + a[1] * w + a[2] * w * w
        return num / den

    return (h(b1, a1) * h(b2, a2)).astype(np.complex64)


def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


# K-weighting implementation switch: "fir_mxu" runs the biquad cascade as
# a truncated-FIR overlap-save Toeplitz matmul on the MXU (6-pass bf16
# split), "fft" as the frequency-domain product; "auto" picks fir_mxu on
# TPU (floor-free measurement at [10, 1M] samples on v5e: fft 14.4 ms,
# fir bf16x6 ≈ 3.9 ms; 2-way splits are NOT enough here — the highpass
# kernel's cancellation κ≈100 amplifies 2⁻¹⁶ to 2e-3) and fft elsewhere.
# NOTE: read at TRACE time — flipping it after a (rate, num_samples) shape
# has compiled is a silent no-op for that shape unless k_weight.clear_cache()
# runs (tests do); it is a test/bench knob, not a runtime switch.
KWEIGHT_IMPL = "auto"

_FIR_TAPS = 2560  # |h| tail ≈ 6e-8 at 44.1 kHz (38 Hz pole, Q=0.5)
_FIR_CHUNK = 1024


def _kweight_mode() -> str:
    if KWEIGHT_IMPL != "auto":
        return KWEIGHT_IMPL
    return "fir_mxu" if jax.default_backend() == "tpu" else "fft"


@lru_cache(maxsize=4)
def _fir_toeplitz(rate: float, taps: int = _FIR_TAPS, chunk: int = _FIR_CHUNK) -> np.ndarray:
    """[chunk+taps-1, chunk] float32 Toeplitz operator of the cascade's
    impulse response (float64 direct-form difference equation on the host;
    y[c·C+j] = Σₖ h[k]·x[c·C+j−k] becomes window_c @ H)."""
    (b1, a1), (b2, a2) = k_weighting_coeffs(rate)
    h = np.zeros(taps, np.float64)
    s1 = np.zeros(2)
    s2 = np.zeros(2)
    for n in range(taps):
        xin = 1.0 if n == 0 else 0.0
        y1 = b1[0] * xin + s1[0]
        s1[0] = b1[1] * xin - a1[1] * y1 + s1[1]
        s1[1] = b1[2] * xin - a1[2] * y1
        y2 = b2[0] * y1 + s2[0]
        s2[0] = b2[1] * y1 - a2[1] * y2 + s2[1]
        s2[1] = b2[2] * y1 - a2[2] * y2
        h[n] = y2
    W = chunk + taps - 1
    H = np.zeros((W, chunk), np.float64)
    for j in range(chunk):
        H[j : j + taps, j] = h[::-1]
    return H.astype(np.float32)


def _k_weight_fir(x: jnp.ndarray, rate: float, T: int) -> jnp.ndarray:
    """Causal zero-state FIR filtering as overlap-save Toeplitz matmuls:
    gather-free overlap framing (reshape + concat) feeds the MXU; no FFT,
    no sequential IIR scan."""
    from .precision import mm_split6

    C, L = _FIR_CHUNK, _FIR_TAPS
    Wd = C + L - 1
    H = jnp.asarray(_fir_toeplitz(rate))
    lead = x.shape[:-1]
    a = x.reshape((-1, x.shape[-1])).astype(jnp.float32)
    R, Ta = a.shape
    nc = -(-Ta // C)
    m = 1 + (-(-(L - 1) // C))  # chunks per window
    xp = jnp.pad(a, ((0, 0), (L - 1, (nc - 1 + m) * C - (Ta + L - 1) + C)))
    chunks = xp[:, : (nc - 1 + m) * C].reshape(R, nc - 1 + m, C)
    rows = jnp.concatenate([chunks[:, j : j + nc] for j in range(m)], axis=-1)[:, :, :Wd]
    y = mm_split6(rows.reshape(R * nc, Wd), H).reshape(R, nc * C)
    return y[:, :Ta].reshape(lead + (Ta,))


@partial(jax.jit, static_argnames=("rate", "num_samples"))
def k_weight(x: jnp.ndarray, rate: float, num_samples: int | None = None) -> jnp.ndarray:
    """K-weighted signal, SAME SHAPE as x ([..., T]) in both impls.
    ``num_samples`` (≤ T) marks how many leading samples are real — the fft
    mode sizes its transform from it; output samples past it are
    unspecified (zero-padding decay) and must not be consumed."""
    Tx = int(x.shape[-1])
    T = Tx if num_samples is None else num_samples
    if _kweight_mode() == "fir_mxu":
        return _k_weight_fir(x, rate, T).astype(x.dtype)
    pad = 8192  # > 1000 decay constants of the 38 Hz pole
    nfft = _next_pow2(T + pad)
    H = jnp.asarray(_cascade_response(rate, nfft))
    spec = jnp.fft.rfft(x, n=nfft, axis=-1) * H
    y = jnp.fft.irfft(spec, n=nfft, axis=-1)
    y = y[..., :Tx] if y.shape[-1] >= Tx else jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, Tx - y.shape[-1])])
    return y.astype(x.dtype)


def _gated_lufs(z: jnp.ndarray, nblocks: jnp.ndarray, gain_db: jnp.ndarray | float = 0.0):
    """Two-stage gated loudness from block powers.

    z: [..., K] block powers of the *unnormalised* signal; ``gain_db``
    shifts block loudness (e.g. −20·log10(peak) for the reference's
    peak-normalise-before-metering, Code/audioPipeline.py:348-350);
    nblocks: [...] valid block counts.
    """
    k = jnp.arange(z.shape[-1])
    valid = k < nblocks[..., None]
    l_blk = OFFSET + 10.0 * jnp.log10(jnp.maximum(z, 1e-30)) + (
        gain_db[..., None] if jnp.ndim(gain_db) else gain_db
    )
    g1 = valid & (l_blk > ABS_GATE)
    n1 = jnp.sum(g1, axis=-1)
    z_shift = z * 10.0 ** ((gain_db[..., None] if jnp.ndim(gain_db) else gain_db) / 10.0)
    z_avg1 = jnp.sum(jnp.where(g1, z_shift, 0.0), axis=-1) / jnp.maximum(n1, 1)
    gamma_r = OFFSET + 10.0 * jnp.log10(jnp.maximum(z_avg1, 1e-30)) - 10.0
    g2 = g1 & (l_blk > gamma_r[..., None])
    n2 = jnp.sum(g2, axis=-1)
    z_avg2 = jnp.sum(jnp.where(g2, z_shift, 0.0), axis=-1) / jnp.maximum(n2, 1)
    lufs = OFFSET + 10.0 * jnp.log10(jnp.maximum(z_avg2, 1e-30))
    # no blocks above the absolute gate → −inf in pyloudnorm; return a
    # large negative sentinel that still behaves in later arithmetic
    return jnp.where(n2 > 0, lufs, -jnp.inf)


def _num_blocks(duration_samples: jnp.ndarray, rate: float) -> jnp.ndarray:
    """pyloudnorm: int(round((dur_s − T_g)/(T_g·step))) + 1 (ties-to-even,
    matching Python round)."""
    dur = duration_samples / rate
    raw = (dur - BLOCK_SECONDS) / (BLOCK_SECONDS * (1.0 - OVERLAP))
    n = jnp.round(raw).astype(jnp.int32) + 1
    return jnp.where(dur >= BLOCK_SECONDS, jnp.maximum(n, 1), 0)


def max_blocks_for(num_samples: int, rate: float) -> int:
    return max(1, int(round((num_samples / rate - BLOCK_SECONDS) / (BLOCK_SECONDS * 0.25))) + 2)


@partial(jax.jit, static_argnames=("rate", "max_blocks"))
def windowed_loudness(
    x: jnp.ndarray,
    rate: float,
    starts: jnp.ndarray,
    ends: jnp.ndarray,
    peaks: jnp.ndarray,
    max_blocks: int,
):
    """Gated LUFS of arbitrary sample windows of pre-K-weighted signal x.

    x: [..., T] K-WEIGHTED samples *in raw amplitude units* (pass the
    integer-scale signal, or any scale: per-window peak normalisation is
    applied via ``peaks``, the reference's pre-metering normaliser).
    starts/ends: [..., N] sample indices; peaks: [..., N] window abs-peaks
    in the same units as x.

    Returns (lufs [..., N], valid [..., N]); valid=False reproduces
    pyloudnorm's "length must exceed the block size" ValueError, which the
    caller turns into the reference's full-file fallback.
    """
    from .cumsum import ChunkedCumsum

    x2 = jnp.square(x.astype(jnp.float32))
    dur = ends - starts
    nblocks = _num_blocks(dur.astype(jnp.float32), rate)
    T = x.shape[-1]
    G = BLOCK_SECONDS * rate * (1.0 - OVERLAP)  # block stride in samples
    # tolerance gate, not is_integer(): G is a float product, and a rate
    # whose product rounds off-integer by an ulp would otherwise silently
    # drop to the ~17 ms gather path
    if abs(G - round(G)) < 1e-6:
        G = round(G)
        # Grid-cumsum formulation (all standard rates: G integer). The
        # gather formulation below costs ~50 ns/element on TPU and needs
        # 4·mb lookups per window (measured 17 ms of the 50 ms measure
        # program at corpus shape). Every block edge sits on start + G·m,
        # so per window the needed cumsum values C(start + G·m) form a
        # CONTIGUOUS run in a (phase-major, block-minor) transposed table:
        # C(G·q + g) = W2T[g, q], and with a flattened [G·nq] layout the
        # run is one dynamic slice of mb+5 elements — sequential DMA
        # instead of scattered lookups. Parity: C is nondecreasing, so
        # clamping block ends to the window end equals min-capping in
        # cumsum space: z[j] = f(j+4) − f(j), f(i) = min(C(start+G·i) −
        # C(start), C(end) − C(start)).
        Gi = int(G)
        # blocks span `nb` strides (4 at the standard 75 % overlap):
        # z[j] = f(j+nb) − f(j); keep derived from OVERLAP so this path
        # can never silently diverge from the gather fallback
        nb = round(1.0 / (1.0 - OVERLAP))
        assert abs(BLOCK_SECONDS * rate - nb * Gi) < 1e-6, (rate, G)
        mb5 = max_blocks + nb + 1
        flat_x = x2.reshape((-1, T))
        R = flat_x.shape[0]
        nq = T // Gi + 1
        stride = nq + mb5
        xq = jnp.pad(flat_x, ((0, 0), (0, nq * Gi - T))).reshape(R, nq, Gi)
        bsum = xq.sum(axis=-1)
        W = jnp.cumsum(xq, axis=-1) - xq  # exclusive within-block
        Cg = jnp.cumsum(bsum, axis=-1) - bsum  # exclusive block prefix
        W2T = jnp.swapaxes(W + Cg[..., None], -1, -2)  # [R, Gi, nq]: C(Gi·q+g)
        total = Cg[:, -1] + bsum[:, -1]
        # extend the block axis so q0+m stays in range; C is flat past T
        ext = jnp.broadcast_to(total[:, None, None], (R, Gi, mb5))
        table = jnp.concatenate([W2T, ext], axis=-1).reshape(R, Gi * stride)

        st = jnp.clip(starts.reshape((R, -1)), 0, T)
        en = jnp.clip(ends.reshape((R, -1)), 0, T)
        base = (st % Gi) * stride + st // Gi

        def slice_at(row, b, n):
            return jax.lax.dynamic_slice(row, (b,), (n,))

        sl = jax.vmap(lambda row, bs: jax.vmap(lambda b: slice_at(row, b, mb5))(bs))(table, base)
        s_all = sl - sl[..., :1]  # C(start + G·m) − C(start)
        # C(end) from the same table (single element per window)
        e_base = (en % Gi) * stride + en // Gi
        ce = jax.vmap(lambda row, bs: jax.vmap(lambda b: slice_at(row, b, 1))(bs))(table, e_base)
        e_rel = ce[..., 0] - sl[..., 0]
        f = jnp.minimum(s_all, e_rel[..., None])  # [R, N, mb+5]
        z = (f[..., nb : nb + max_blocks] - f[..., :max_blocks]) / (BLOCK_SECONDS * rate)
        z = z.reshape(starts.shape + (max_blocks,))
    else:
        cs = ChunkedCumsum.build(x2)
        # block spans, clamped to the window end as well as the signal end
        j = jnp.arange(max_blocks)
        lo_off = jnp.floor(G * j).astype(jnp.int32)
        hi_off = jnp.floor(BLOCK_SECONDS * rate * ((1.0 - OVERLAP) * j + 1.0)).astype(jnp.int32)
        lo = jnp.clip(starts[..., None] + lo_off, 0, T)
        hi = jnp.minimum(jnp.clip(starts[..., None] + hi_off, 0, T), ends[..., None])
        hi = jnp.maximum(hi, lo)
        z = cs.range_sum(lo, hi) / (BLOCK_SECONDS * rate)
    gain_db = -20.0 * jnp.log10(jnp.maximum(peaks, 1e-30))
    lufs = _gated_lufs(z, nblocks, gain_db)
    return lufs, nblocks > 0


def integrated_loudness(x: np.ndarray | jnp.ndarray, rate: float) -> float:
    """Whole-signal gated loudness (pyloudnorm Meter.integrated_loudness
    equivalent; mono). Raises ValueError for signals < 400 ms, like
    pyloudnorm — the reference relies on that for its fallback path."""
    x = jnp.asarray(x)
    if x.shape[-1] < BLOCK_SECONDS * rate:
        raise ValueError("Audio must have length greater than the block size")
    y = k_weight(x, rate)
    starts = jnp.zeros(x.shape[:-1] + (1,), jnp.int32)
    ends = jnp.full(x.shape[:-1] + (1,), x.shape[-1], jnp.int32)
    peaks = jnp.ones(x.shape[:-1] + (1,), jnp.float32)
    lufs, _ = windowed_loudness(
        y, rate, starts, ends, peaks, max_blocks=max_blocks_for(int(x.shape[-1]), rate)
    )
    return float(np.asarray(lufs)[..., 0]) if lufs.ndim == 1 else np.asarray(lufs)[..., 0]
