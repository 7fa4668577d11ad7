"""Typed configuration tree, compatible with the reference config.yaml.

The reference parses config.yaml ad hoc with ``.get`` defaults scattered
through ``AudioPipeline.__init__`` (Code/audioPipeline.py:110-139) and its
``${AZURE_API_KEY}`` "interpolation" is fake — the literal string is used
as a file path (config.yaml:6, Code/audioPipeline.py:99,153). Here:

- one dataclass tree with the same keys and defaults, so existing voice
  configs run unchanged (BASELINE.md requirement);
- real ``${ENV_VAR}`` interpolation in every string value;
- extra keys new to this framework (``tts_backend``, ``aligner``) default
  to the reference behaviour.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from pathlib import Path

import yaml

from ..prosody.adjust import ProsodySettings

_ENV = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _interp(value):
    if isinstance(value, str):
        return _ENV.sub(lambda m: os.environ.get(m.group(1), m.group(0)), value)
    if isinstance(value, dict):
        return {k: _interp(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_interp(v) for v in value]
    return value


@dataclass
class SilenceSettings:
    """config.yaml ``silence`` (config.yaml:19-22)."""

    min_silence_len: int = 1000
    silence_thresh: float = -50.0
    keep_silence: int = 300


@dataclass
class PipelineConfig:
    base_dir: Path
    data_dir: str = "Data/voice"
    out_dir: str = "Out"
    azure_key_file: str = ""
    voice_names: list[str] = field(default_factory=list)
    azure_voice_name: str = "fr-FR-HenriNeural"
    azure_region: str = "francecentral"
    whisper_model: str = "turbo"
    whisper_device: str = "tpu"
    silence: SilenceSettings = field(default_factory=SilenceSettings)
    prosody: ProsodySettings = field(default_factory=ProsodySettings)
    steps_to_run: list[str] | None = None
    multiprocessing: bool = False
    num_processes: int = 1
    ab_test: dict = field(default_factory=dict)
    # framework extensions (absent from reference configs → defaults)
    tts_backend: str = "azure"  # azure | fake
    aligner: str = "precomputed"  # precomputed | energy | ctc | whisper_jax
    pos_backend: str = "lexicon"  # lexicon | contextual (models/pos_tagger)
    raw: dict = field(default_factory=dict)

    @property
    def data_path(self) -> Path:
        return self.base_dir / self.data_dir

    @property
    def out_path(self) -> Path:
        return self.base_dir / self.out_dir

    def read_azure_key(self) -> str:
        p = Path(self.azure_key_file)
        if not p.is_absolute():
            p = self.base_dir / p
        if p.exists():
            return p.read_text(encoding="utf-8").strip()
        return os.environ.get("AZURE_API_KEY", "")

    @classmethod
    def from_dict(cls, cfg: dict, base_dir: str | Path) -> "PipelineConfig":
        cfg = _interp(cfg)
        voices = cfg.get("voice_names") or []
        if isinstance(voices, str):
            voices = [voices]
        sil = cfg.get("silence", {}) or {}
        return cls(
            base_dir=Path(base_dir),
            data_dir=cfg.get("data_dir", "Data/voice"),
            out_dir=cfg.get("out_dir", "Out"),
            azure_key_file=cfg.get("azure_key_file", ""),
            voice_names=list(voices),
            azure_voice_name=cfg.get("azure_voice_name", "fr-FR-HenriNeural"),
            azure_region=cfg.get("azure_region", "francecentral"),
            whisper_model=cfg.get("whisper_model", "turbo"),
            whisper_device=cfg.get("whisper_device", "tpu"),
            silence=SilenceSettings(
                min_silence_len=sil.get("min_silence_len", 1000),
                silence_thresh=sil.get("silence_thresh", -50),
                keep_silence=sil.get("keep_silence", 300),
            ),
            prosody=ProsodySettings.from_config(cfg),
            steps_to_run=cfg.get("steps_to_run"),
            multiprocessing=bool(cfg.get("multiprocessing", False)),
            num_processes=int(cfg.get("num_processes", 1)),
            ab_test=cfg.get("ab_test", {}) or {},
            tts_backend=cfg.get("tts_backend", "azure"),
            aligner=cfg.get("aligner", "precomputed"),
            pos_backend=cfg.get("pos_backend", "lexicon"),
            raw=cfg,
        )


def load_config(path: str | Path) -> PipelineConfig:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Missing config.yaml at {path}")
    with open(path, "r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    if not cfg:
        raise ValueError("Empty config.yaml")
    return PipelineConfig.from_dict(cfg, path.resolve().parent)
