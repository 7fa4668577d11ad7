"""Audio corpus utilities: merge, corpus assembly, AB-test staging."""

from .merge import merge_wav_from_folder, merge_wavs  # noqa: F401
from .corpus import build_natural_corpus, stage_abtest_files  # noqa: F401
