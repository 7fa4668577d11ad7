"""Alignment: one ``Aligner`` protocol covering the reference's five
aligner backends (SURVEY.md §2 L2: whisper-timestamped, MFA, NeMo, CTC-FA,
WhisperX) plus hermetic test aligners."""

from .base import Aligner, AlignedWord, get_aligner  # noqa: F401
from .energy import EnergyAligner  # noqa: F401
from .precomputed import PrecomputedAligner  # noqa: F401
from .ctc import ctc_forced_align, ctc_loss  # noqa: F401
from .g2p_fr import PhonemeVocab, enrich_lexicon_file, g2p_word  # noqa: F401
from .levenshtein_merge import merge_textgrids  # noqa: F401
from .needleman_wunsch import needleman_wunsch  # noqa: F401
