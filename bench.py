"""Benchmark: prosody-extraction throughput (the BASELINE.md north star).

Runs the batched measure device program (full Boersma F0 track + windowed
gated LUFS on natural and raw corpora + per-syntagme medians) over the
reference's bundled corpus (10 segments, ≈162 s of 44.1 kHz speech) and
reports audio-hours processed per wall-clock hour on the current device.

Target: ≥100 audio-hours/hour on a v5e-8 ⇒ vs_baseline = value/100 on the
single bench chip ≥ ~12.5 at parity (ICI scaling of a per-segment batch
axis is embarrassingly parallel).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

import jax

# persistent compile cache: the bench VM has 1 vCPU — recompiling the
# measure program every run costs minutes; cache hits cost milliseconds
jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

CORPUS = Path("/root/reference/Data/voice/records/audio")


def _load_corpus():
    from prosody_control_french_tts_tpu.prosody.measure import bucket_length, segment_sort_key
    from prosody_control_french_tts_tpu.utils.wavio import read_wav

    wavs = sorted(CORPUS.glob("*.wav"), key=segment_sort_key)
    sigs = [np.asarray(read_wav(w).to_mono().samples, np.float32) for w in wavs]
    rate = read_wav(wavs[0]).rate
    T = bucket_length(max(s.size for s in sigs))
    nat = np.zeros((len(sigs), T), np.float32)
    lens = np.zeros(len(sigs), np.int32)
    for i, s in enumerate(sigs):
        nat[i, : s.size] = s
        lens[i] = s.size
    return nat, lens, rate


def main():
    from prosody_control_french_tts_tpu.ops.pitch import PitchParams
    from prosody_control_french_tts_tpu.prosody.measure import _measure_device

    nat, lens, rate = _load_corpus()
    S, T = nat.shape
    total_audio_s = float(lens.sum()) / rate

    # synthetic syntagme windows: 1 s panes over each segment (the measure
    # stage's per-syntagme workload shape), 32 per segment
    N = 32
    win = np.zeros((S, N, 2), np.int32)
    mask = np.zeros((S, N), bool)
    for i in range(S):
        step = max(int(lens[i]) // N, 1)
        for j in range(N):
            a = j * step
            b = min(a + step, int(lens[i]))
            win[i, j] = (a, max(b, a))
            mask[i, j] = b > a

    # "raw" corpus stand-in: the same audio (identical compute shape as the
    # real raw synthesis, which the bench must not depend on a network for).
    # Each timed iteration gets distinct device inputs — identical arg
    # objects let the runtime skip re-execution.
    kw = dict(rate=float(rate), T=T, T2=T, pp=PitchParams())
    iters = 5
    rng = np.random.default_rng(0)
    arg_sets = []
    for k in range(iters + 1):
        x = nat.copy()
        x[:, 0] += np.float32(1e-6 * (k + 1))
        arg_sets.append(
            (
                jax.device_put(x),
                jax.device_put(lens),
                jax.device_put(x),
                jax.device_put(lens),
                jax.device_put(win),
                jax.device_put(win),
                jax.device_put(mask),
            )
        )

    # warmup/compile — must READ a value: on this runtime (axon tunnel,
    # and this jax build generally) block_until_ready does NOT force
    # compilation/execution of unconsumed results, so a block-only warmup
    # leaves the compile inside the timed region.
    out = _measure_device(*arg_sets[-1], **kw)
    float(np.asarray(out[1])[0])

    # Each iteration pulls one scalar to host for the same reason.
    sink = 0.0
    t0 = time.perf_counter()
    for k in range(iters):
        out = _measure_device(*arg_sets[k], **kw)
        sink += float(np.asarray(out[1])[0])
    dt = time.perf_counter() - t0
    assert np.isfinite(sink)

    audio_hours = total_audio_s * iters / 3600.0
    wall_hours = dt / 3600.0
    value = audio_hours / wall_hours
    print(
        json.dumps(
            {
                "metric": "prosody_extraction_throughput",
                "value": round(value, 1),
                "unit": "audio-hours/hour",
                "vs_baseline": round(value / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
