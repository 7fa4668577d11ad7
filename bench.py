"""Benchmark: prosody-extraction throughput (the BASELINE.md north star).

Runs the batched measure device program (full Boersma F0 track + windowed
gated LUFS on natural and raw corpora + per-syntagme medians) over the
reference's bundled corpus (10 segments, ≈162 s of 44.1 kHz speech) and
reports audio-hours processed per wall-clock hour on the current device.

Measurement shape mirrors production (`prosody.measure.measure_voices_batched`
+ `core.batch_runner`): segments grouped into padded length buckets — the
frame grid depends on the padded length, so bucket grouping is also the
parity-preserving layout — with every bucket's program dispatched
asynchronously and results drained at the end. That is the steady-state
regime of a corpus run: the device never idles on a host round-trip.

Target: ≥100 audio-hours/hour on a v5e-8 ⇒ vs_baseline = value/100 on the
single bench chip ≥ ~12.5 at parity (ICI scaling of a per-segment batch
axis is embarrassingly parallel).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

import jax

# persistent compile cache: the bench VM has 1 vCPU — recompiling the
# measure program every run costs minutes; cache hits cost milliseconds
jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CORPUS = Path("/root/reference/Data/voice/records/audio")


def _load_corpus():
    from prosody_control_french_tts_tpu.prosody.measure import segment_sort_key
    from prosody_control_french_tts_tpu.utils.wavio import read_wav

    wavs = sorted(CORPUS.glob("*.wav"), key=segment_sort_key)
    sigs = [np.asarray(read_wav(w).to_mono().samples, np.float32) for w in wavs]
    rate = read_wav(wavs[0]).rate
    return sigs, rate


def _bucket_args(sig_list, T, rate, pp, jitter):
    """Padded batch + synthetic 1 s syntagme windows (the measure stage's
    per-syntagme workload shape, 32 per segment) for one length bucket.
    Each iteration's inputs differ by `jitter` — identical arg objects
    would let the runtime skip re-execution."""
    S = len(sig_list)
    nat = np.zeros((S, T), np.float32)
    lens = np.zeros(S, np.int32)
    for i, s in enumerate(sig_list):
        nat[i, : s.size] = s
        lens[i] = s.size
    nat[:, 0] += np.float32(jitter)
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
    x = jax.device_put(nat)
    args = (
        x,
        jax.device_put(lens),
        # "raw" corpus stand-in: the same audio (identical compute shape as
        # the real raw synthesis — the bench must not depend on a network)
        x,
        jax.device_put(lens),
        jax.device_put(win),
        jax.device_put(win),
        jax.device_put(mask),
    )
    return args, dict(rate=float(rate), T=T, T2=T, pp=pp)


def main():
    from prosody_control_french_tts_tpu.ops.pitch import PitchParams
    from prosody_control_french_tts_tpu.prosody.measure import _measure_device, bucket_length

    sigs, rate = _load_corpus()
    total_audio_s = sum(s.size for s in sigs) / rate
    pp = PitchParams()

    groups = defaultdict(list)
    for s in sigs:
        groups[bucket_length(s.size)].append(s)

    iters = 5
    arg_sets = [
        [_bucket_args(v, T, rate, pp, 1e-6 * (k + 1)) for T, v in sorted(groups.items())]
        for k in range(iters + 1)
    ]

    # warmup/compile — must READ a value per bucket shape: on this runtime
    # (axon tunnel, and this jax build generally) block_until_ready does NOT
    # force compilation/execution of unconsumed results, so a block-only
    # warmup leaves the compile inside the timed region.
    for args, kw in arg_sets[-1]:
        out = _measure_device(*args, **kw)
        float(np.asarray(out[1])[0])

    # Steady state: dispatch every bucket of every iteration asynchronously,
    # then drain one scalar from each result (forces execution of all of
    # them; per-call sync reads would serialize tunnel round-trips).
    t0 = time.perf_counter()
    outs = []
    for k in range(iters):
        outs += [_measure_device(*args, **kw) for args, kw in arg_sets[k]]
    sink = sum(float(np.asarray(out[1])[0]) for out in outs)
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
