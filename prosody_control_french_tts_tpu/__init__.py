"""prosody_control_french_tts_tpu — a TPU-native prosody-control TTS framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hi-paris/Prosody-Control-French-TTS (reference mounted read-only at
/root/reference): take a natural French recording, segment it on silences,
force-align it at the word level, measure prosody (F0 / loudness / speaking
rate) per pause-delimited syntagme, convert natural-vs-synthetic differences
into clamped and smoothed SSML ``<prosody>``/``<break>`` adjustments,
re-synthesize and stitch, and train prosody-prediction models (break tagger,
BiLSTM regressor, LoRA LLM cascade) on the exported data.

Architecture (see SURVEY.md §7):

- ``core``     typed config tree (reference ``config.yaml`` schema compatible),
               step registry with resume, logging/metrics.
- ``utils``    host-side I/O: WAV codec, TextGrid parser/writer, French
               closed-class POS tagging, text normalisation.
- ``audio``    decode → arrays, silence splitting (energy-scan), stitching.
- ``ops``      the TPU compute layer: batched STFT, Boersma-style
               autocorrelation pitch with Viterbi path, ITU-R BS.1770 LUFS,
               RMS energy, DTW — jitted JAX + Pallas kernels.
- ``align``    aligner protocol (TextGrid provider, energy aligner, CTC
               forced alignment, Whisper-style encoder) — one switch covering
               the reference's five aligner backends.
- ``prosody``  pure-jnp adjustment math numerically matching the reference
               (Code/audioPipeline.py:261-711).
- ``ssml``     syntagme construction, pause filtering, tag emission/parsing.
- ``tts``      backend protocol: Azure REST client + deterministic fake
               backend for hermetic tests; waveform stitcher.
- ``models``   flax: BERT break tagger, BiLSTM prosody regressor, decoder LLM
               with LoRA (pjit-sharded) for the cascaded SSML tagger.
- ``parallel`` mesh construction, sharding policies, collectives helpers.
- ``eval``     break comparison, F0-RMSE(DTW), WER, aligner gold harness,
               AB-test pair builder.
- ``viz``      plot-data endpoints reusing the ops kernels.

Unlike the reference (file-based hand-off between subprocesses, one OS
process per voice), this framework keeps a voice corpus as batched arrays in
HBM — ``{audio: f32[S, T], f0: f32[S, F], loudness blocks, syntagme spans}``
— and parallelises over a ``jax.sharding.Mesh`` instead of a process pool.
"""

__version__ = "0.1.0"

from . import utils  # noqa: F401
