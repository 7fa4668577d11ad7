"""Multi-voice batched execution.

The reference parallelises voices with an OS process pool, one Whisper
model per process (~6 GB each, config.yaml:57-58,
Code/audioPipeline.py:1143-1150). Here voices share ONE device program:
every voice's segments concatenate on the batch axis of the measure
kernel (prosody.measure.measure_voices_batched), and only host-side
emission loops per voice. A reference config's ``multiprocessing: true``
maps to this batched path; failures stay isolated per voice.
"""

from __future__ import annotations

import logging

from ..prosody.measure import MeasureResult, measure_voices_batched, prepare_voice
from .config import PipelineConfig
from .pipeline import AudioPipeline

log = logging.getLogger(__name__)


def measure_all_voices(pipes: list[AudioPipeline]) -> dict[str, MeasureResult]:
    """One batched measure pass over every voice's segments."""
    preps = {}
    settings = None
    for pipe in pipes:
        segs = pipe._segment_files()
        if not segs:
            log.warning("no segments for %s", pipe.name)
            continue
        settings = pipe.cfg.prosody
        preps[pipe.name] = prepare_voice(segs, pipe.textgrid_dir, pipe.raw_audio_dir, settings)
    if not preps:
        return {}
    return measure_voices_batched(preps, settings)


def run_all_voices(cfg: PipelineConfig, tts=None) -> list[tuple[bool, str]]:
    """Drive every configured voice with the batched measure stage.

    Steps other than measure run per voice (they are host/IO-bound); the
    measure stage computes all voices in one device program and injects
    the result into each pipeline before its measure step runs (the step
    then only emits CSVs).
    """
    pipes = []
    for name in cfg.voice_names:
        try:
            pipes.append(AudioPipeline(name, cfg, tts=tts))
        except Exception as e:  # noqa: BLE001
            log.error("init failed for %s: %s", name, e)

    steps_before = ["Preprocess", "Align+Transcribe", "Raw Synthesis"]
    steps_after = [
        "Measure & Build SSML",
        "Synthesize+Merge",
        "Export JSON",
        "Final Transcribe",
        "Compare Breaks",
    ]
    to_run = cfg.steps_to_run or steps_before + steps_after
    results: list[tuple[bool, str]] = []
    alive: list[AudioPipeline] = []
    for pipe in pipes:
        try:
            for name, fn in [
                ("Preprocess", pipe.preprocess),
                ("Align+Transcribe", pipe.align_and_transcribe),
                ("Raw Synthesis", pipe.raw_synthesis),
            ]:
                if name in to_run:
                    fn()
            alive.append(pipe)
        except Exception:  # noqa: BLE001
            log.exception("pre-measure steps failed for %s", pipe.name)
            results.append((False, pipe.name))

    measured = {}
    if "Measure & Build SSML" in to_run and alive:
        try:
            measured = measure_all_voices(alive)
        except Exception:  # noqa: BLE001
            log.exception("batched measure failed; falling back per voice")

    for pipe in alive:
        try:
            if "Measure & Build SSML" in to_run:
                if pipe.name in measured:
                    pipe.emit_measure_csvs(measured[pipe.name])
                else:
                    pipe.measure_prosody_and_build_ssml()
            for name, fn in [
                ("Synthesize+Merge", pipe.synthesize_and_merge),
                ("Export JSON", pipe.export_training_json),
                ("Final Transcribe", pipe.final_transcribe),
                ("Compare Breaks", pipe.compare_breaks),
            ]:
                if name in to_run:
                    fn()
            results.append((True, pipe.name))
        except Exception:  # noqa: BLE001
            log.exception("pipeline failed for %s", pipe.name)
            results.append((False, pipe.name))

    failed = [n for ok, n in results if not ok]
    if failed:
        log.error("Some pipelines failed: %s", ", ".join(failed))
    return results
