"""The prosody adjustment math of the reference, as pure JAX functions.

Every formula here is a line-for-line *numerical* equivalent of the modern
pipeline's core (Code/audioPipeline.py:261-711) — same clamps, same
asymmetries, same smoothing order — but vectorised over [segments,
syntagmes] arrays instead of per-syntagme Python loops with per-call wav
re-reads. Inputs come from the ``ops`` kernels (median F0, windowed LUFS,
durations); outputs are the pitch/volume/rate percentages that the SSML
emitter renders.

Shapes: flat syntagme axis [N] (the reference concatenates all segments'
syntagmes into one dataframe before smoothing — EMA state deliberately
carries across segment boundaries, Code/audioPipeline.py:592-602).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ProsodySettings:
    """config.yaml ``prosody_settings`` (reference schema, config.yaml:25-43;
    defaults from Code/audioPipeline.py:127-139)."""

    pitch_semitones: float = 2.0
    pitch_lower_clip_factor: float = 0.7
    volume_pct: float = 7.0
    rate_percent: float = 15.0
    smoothing_alpha: float = 0.4
    max_jump_percent: float = 5.0
    end_punctuation_pause_ms: int = 150
    baseline_window: int | None = None
    inter_syntagme_pause_factor: float = 1.0
    threshold_duration_before_slowing_down: float = 1.0
    slow_floor_per_sec: float = 2.0

    @classmethod
    def from_config(cls, cfg: dict) -> "ProsodySettings":
        p = cfg.get("prosody_settings", {}) or {}
        return cls(
            pitch_semitones=p.get("pitch_semitones", 2.0),
            pitch_lower_clip_factor=p.get("pitch_lower_clip_factor", 0.7),
            volume_pct=p.get("volume_pct", 7.0),
            rate_percent=p.get("rate_percent", 15.0),
            smoothing_alpha=p.get("smoothing_alpha", 0.4),
            max_jump_percent=p.get("max_jump_percent", 5.0),
            end_punctuation_pause_ms=p.get("end_punctuation_pause_ms", 150),
            baseline_window=p.get("baseline_window", None),
            inter_syntagme_pause_factor=p.get("inter_syntagme_pause_factor", 1),
            threshold_duration_before_slowing_down=p.get(
                "threshold_duration_before_slowing_down", 1.0
            ),
            slow_floor_per_sec=p.get("slow_floor_per_sec", 2.0),
        )


# ---------------------------------------------------------------------------
# 1) segment-level sliding-window baselines (Code/audioPipeline.py:401-424)
# ---------------------------------------------------------------------------


def _median(v: np.ndarray) -> float:
    return float(np.median(v)) if v.size else 0.0


def segment_baselines(
    p_nat: np.ndarray, l_nat: np.ndarray, rate_ratio: np.ndarray, window: int | None
) -> dict[str, np.ndarray]:
    """Per-segment F0/loudness/rate baselines.

    window None or ≥ n → one global median for all (zero-pitch segments
    excluded from the F0 median, ``or 1.0`` fallback); otherwise a centred
    window of ``window//2`` each side, clipped at corpus edges.
    Host-side numpy: n_segments is small and the windows are ragged.
    """
    n = len(p_nat)
    p_nat, l_nat, rate_ratio = map(np.asarray, (p_nat, l_nat, rate_ratio))
    if window is None or window >= n:
        f0_all = _median(p_nat[p_nat > 0]) or 1.0
        loud_all = _median(l_nat)
        rate_all = _median(rate_ratio)
        return {
            "f0": np.full(n, f0_all),
            "loud": np.full(n, loud_all),
            "rate": np.full(n, rate_all),
        }
    half = window // 2
    f0 = np.empty(n)
    loud = np.empty(n)
    rate = np.empty(n)
    for i in range(n):
        lo, hi = max(0, i - half), min(n, i + half + 1)
        pw = p_nat[lo:hi]
        f0[i] = _median(pw[pw > 0]) or 1.0
        loud[i] = _median(l_nat[lo:hi])
        rate[i] = _median(rate_ratio[lo:hi])
    return {"f0": f0, "loud": loud, "rate": rate}


# ---------------------------------------------------------------------------
# 2) per-syntagme raw adjustments (Code/audioPipeline.py:524-577)
# ---------------------------------------------------------------------------


def pitch_adjust_pct(
    p_nat: jnp.ndarray, f0_base: jnp.ndarray, pitch_semitones: float, lower_clip_factor: float
) -> jnp.ndarray:
    """Semitone delta vs baseline, clipped to [−P·factor, +P], as percent.

    st = 12·log2(p_nat/f0_base); clip; pct = (2^(st/12)−1)·100
    (Code/audioPipeline.py:524-530). p_nat ≤ 0 → 0 %.
    """
    st = 12.0 * jnp.log2(jnp.maximum(p_nat, 1e-9) / f0_base)
    st = jnp.clip(st, -pitch_semitones * lower_clip_factor, pitch_semitones)
    pct = (jnp.exp2(st / 12.0) - 1.0) * 100.0
    return jnp.where(p_nat > 0, pct, 0.0)


def volume_adjust_pct(loud_base: jnp.ndarray, l_syn: jnp.ndarray, volume_pct: float) -> jnp.ndarray:
    """dB gap → linear percent, clipped ±volume_pct
    (Code/audioPipeline.py:535-537)."""
    db_diff = loud_base - l_syn
    v = (jnp.power(10.0, db_diff / 20.0) - 1.0) * 100.0
    return jnp.clip(v, -volume_pct, volume_pct)


def rate_adjust_pct(
    wc: jnp.ndarray,
    d_nat: jnp.ndarray,
    d_syn: jnp.ndarray,
    settings: ProsodySettings,
) -> jnp.ndarray:
    """Speaking-rate delta with the reference's asymmetric length scaling
    (Code/audioPipeline.py:540-577):

    - rp = (nat_rate − syn_rate)/syn_rate·100 (0 if no words);
    - length > 1 s: slow-downs ×len^1.5, speed-ups ÷√len;
    - extra slow floor: −slow_floor_per_sec·max(0, len−threshold);
    - clamp: ±R (len ≤ 5 s) else [−1.5·R, +0.5·R].
    """
    nat_r = wc / d_nat
    syn_r = wc / d_syn
    rp = jnp.where(wc > 0, (nat_r - syn_r) / syn_r * 100.0, 0.0)

    length_s = d_nat
    slow_factor = jnp.where(length_s <= 1.0, 1.0, jnp.power(length_s, 1.5))
    fast_factor = jnp.where(length_s <= 1.0, 1.0, jnp.sqrt(length_s))
    rp = jnp.where(rp < 0, rp * slow_factor, rp / fast_factor)

    extra_slow = (
        jnp.maximum(0.0, length_s - settings.threshold_duration_before_slowing_down)
        * settings.slow_floor_per_sec
    )
    rp = rp - extra_slow

    r = settings.rate_percent
    max_slowdown = jnp.where(length_s > 5.0, r * 1.5, r)
    max_speedup = jnp.where(length_s > 5.0, r * 0.5, r)
    return jnp.clip(rp, -max_slowdown, max_speedup)


# ---------------------------------------------------------------------------
# 3) smoothing across the flat syntagme sequence (Code/audioPipeline.py:592-602)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("alpha",))
def ema_smooth(x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """sm[0]=x[0]; sm[i]=α·x[i]+(1−α)·sm[i−1] — one lax.scan."""

    def step(prev, cur):
        val = alpha * cur + (1.0 - alpha) * prev
        return val, val

    _, rest = jax.lax.scan(step, x[0], x[1:])
    return jnp.concatenate([x[:1], rest])


@partial(jax.jit, static_argnames=("max_jump",))
def jump_limit(x: jnp.ndarray, max_jump: float) -> jnp.ndarray:
    """Sequential max-jump limiter *applied to the already-smoothed series*,
    with the limited predecessor feeding forward (the reference mutates the
    list it iterates, Code/audioPipeline.py:598-602)."""

    def step(prev, cur):
        diff = cur - prev
        val = jnp.where(jnp.abs(diff) > max_jump, prev + jnp.sign(diff) * max_jump, cur)
        return val, val

    _, rest = jax.lax.scan(step, x[0], x[1:])
    return jnp.concatenate([x[:1], rest])


def smooth_series(x: jnp.ndarray, alpha: float, max_jump: float) -> jnp.ndarray:
    """EMA then jump-limit — the exact two-pass order of the reference
    (pitch and rate only; volume is left raw, Code/audioPipeline.py:592-612)."""
    return jump_limit(ema_smooth(jnp.asarray(x, jnp.float32), alpha), max_jump)
