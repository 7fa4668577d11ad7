"""TPU compute kernels: batched JAX/XLA (+ Pallas) DSP.

This layer replaces the reference's third-party native engines
(SURVEY.md §2 "Native / compute-kernel components"):

- Praat autocorrelation pitch (parselmouth C)  → ``ops.pitch``
- pyloudnorm ITU-R BS.1770 LUFS                → ``ops.loudness``
- pydub RMS/dBFS + silence scan                → ``ops.energy``
- librosa STFT/spectrogram                     → ``ops.stft``
- fastdtw alignment for eval                   → ``ops.dtw``

Everything is batched over a leading segment/frame axis, static-shaped, and
jittable; host round-trips happen only at corpus ingest and file export.
"""

from .pitch import PitchParams, PitchTrack, praat_pitch, median_pitch_in_windows  # noqa: F401
from .loudness import (  # noqa: F401
    k_weighting_coeffs,
    k_weight,
    integrated_loudness,
    windowed_loudness,
    BLOCK_SECONDS,
)
from .energy import dbfs, rms, detect_silence, split_on_silence_ranges  # noqa: F401
from .stft import stft, spectrogram  # noqa: F401
from .dtw import dtw_distance, dtw_path  # noqa: F401
from .cumsum import ChunkedCumsum, chunked_cumsum_sq  # noqa: F401
from .rangemax import RangeMax  # noqa: F401
