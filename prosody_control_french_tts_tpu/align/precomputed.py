"""Aligner that serves pre-existing TextGrids from a directory.

Covers the reference's resume-from-disk pattern (every step's state is
files; steps_to_run lets the operator skip alignment when TextGrids are
already on disk, SURVEY.md §5 failure-detection notes).
"""

from __future__ import annotations

from pathlib import Path

from ..utils.textgridio import TextGrid, read_textgrid
from ..utils.wavio import Audio
from .base import Aligner  # noqa: F401 (protocol conformance)


class PrecomputedAligner:
    def __init__(self, textgrid_dir: str | Path, name: str | None = None):
        self.textgrid_dir = Path(textgrid_dir)
        self._current: str | None = name

    def for_segment(self, name: str) -> "PrecomputedAligner":
        return PrecomputedAligner(self.textgrid_dir, name)

    def align(self, audio: Audio, transcript: str | None = None) -> TextGrid:
        if self._current is None:
            raise ValueError("PrecomputedAligner needs a segment name (use for_segment)")
        return read_textgrid(self.textgrid_dir / f"{self._current}.TextGrid")

    def transcribe(self, audio: Audio) -> str:
        tg = self.align(audio)
        return " ".join(iv.mark.strip() for iv in tg.tiers[0] if iv.mark.strip())
