"""TTS backends and the waveform stitcher."""

from .base import TTSBackend, TTSError  # noqa: F401
from .fake import FakeBackend  # noqa: F401
from .azure import AzureBackend  # noqa: F401
from .stitch import stitch_rows, StitchResult  # noqa: F401
