"""SSML construction and parsing: syntagmes → <prosody>/<break> tags."""

from .syntagme import (  # noqa: F401
    Syntagme,
    extract_words_and_pauses,
    filter_function_word_pauses,
    inject_punctuation_pauses,
    construct_syntagmes,
)
from .emit import (  # noqa: F401
    prosody_piece,
    segment_ssml,
    syntagme_ssml,
    syntagme_ssml_no_break,
    break_only_ssml,
)
from .parse import parse_training_rows, combine_training_data  # noqa: F401
