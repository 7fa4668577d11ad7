"""Serving: batched low-latency SSML prediction service."""

from .batcher import MicroBatcher  # noqa: F401
from .predictor import SSMLPredictor  # noqa: F401
