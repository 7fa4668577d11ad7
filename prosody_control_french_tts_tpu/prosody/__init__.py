"""Prosody adjustment math — pure jnp, numerically matching the reference."""

from .adjust import (  # noqa: F401
    ProsodySettings,
    segment_baselines,
    pitch_adjust_pct,
    volume_adjust_pct,
    rate_adjust_pct,
    ema_smooth,
    jump_limit,
    smooth_series,
)
