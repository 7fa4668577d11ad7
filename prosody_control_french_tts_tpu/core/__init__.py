"""Core: typed config, logging, the step-registry pipeline."""

from .config import PipelineConfig, load_config  # noqa: F401
from .pipeline import AudioPipeline, run_pipeline_for_voice  # noqa: F401
