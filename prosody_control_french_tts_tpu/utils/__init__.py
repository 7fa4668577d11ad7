"""Host-side utilities: WAV I/O, TextGrid I/O, French POS, text normalisation."""

from . import wavio, textgridio, fr_pos, text  # noqa: F401
