"""The per-voice pipeline: the reference's 8-step state machine, rebuilt.

Step names, directory conventions and file artifacts match the reference
(Code/audioPipeline.py:83-1103) so existing voice layouts and
``steps_to_run`` configs run unchanged:

    Data/voice/<name>/{brute,audio,transcription,transcription_raw,
                       WhisperTS_textgrid_files}
    Data/voice/<name>_raw/{audio,transcription}
    Data/voice/<name>_ssml/{xml_files,audio}
    Out/results/<name>/{BDD_ssml.csv,BDD_syntagme_ssml.csv,
                        BDD_syntagme_for_synth.csv,OUT.wav,...}

Differences by design (SURVEY.md §7 idiomatic shifts): between steps the
voice corpus lives as arrays (the measure step is one batched device
program); the TTS backend is a protocol (Azure REST or the deterministic
fake); per-voice parallelism is a batch axis, not an OS process.
"""

from __future__ import annotations

import csv
import json
import logging
import shutil
import sys
from pathlib import Path

import numpy as np
import yaml

from ..align.base import get_aligner
from ..prosody.measure import MeasureResult, measure_voice, segment_sort_key
from ..ssml import emit as ssml_emit
from ..ssml.parse import combine_training_data, write_training_json
from ..tts.base import TTSBackend
from ..tts.stitch import stitch_rows
from ..utils import fr_pos
from ..utils.textgridio import TextGrid, write_textgrid
from ..utils.wavio import Audio, read_wav, write_wav
from .config import PipelineConfig
from .profiling import phase

log = logging.getLogger(__name__)


def setup_logging(out_dir: Path) -> logging.Logger:
    """Console WARNING+, Out/logs/pipeline_debug.log DEBUG+
    (Code/audioPipeline.py:42-62)."""
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
    root.setLevel(logging.DEBUG)
    logs = out_dir / "logs"
    logs.mkdir(parents=True, exist_ok=True)
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    ch = logging.StreamHandler()
    ch.setLevel(logging.WARNING)
    ch.setFormatter(fmt)
    root.addHandler(ch)
    fh = logging.FileHandler(str(logs / "pipeline_debug.log"), mode="w", encoding="utf-8")
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(fmt)
    root.addHandler(fh)
    return root


class AudioPipeline:
    def __init__(self, name: str, cfg: PipelineConfig, tts: TTSBackend | None = None):
        self.name = name
        self.cfg = cfg
        base = cfg.base_dir

        self.data_dir = cfg.data_path
        self.out_dir = cfg.out_path
        self.voice_dir = self.data_dir / name
        self.raw_synth_dir = self.data_dir / f"{name}_raw"
        self.ssml_dir = self.data_dir / f"{name}_ssml"
        self.xml_dir = self.ssml_dir / "xml_files"
        self.audio_out = self.ssml_dir / "audio"
        self.results_dir = self.out_dir / "results" / name
        self.audio_ssml_dir = self.results_dir / "segmented_audio"

        self.textgrid_dir = self.voice_dir / "WhisperTS_textgrid_files"
        self.transcription_dir = self.voice_dir / "transcription"
        self.transcription_raw_dir = self.voice_dir / "transcription_raw"
        self.raw_audio_dir = self.raw_synth_dir / "audio"
        self.bdd_ssml_csv = self.results_dir / "BDD_ssml.csv"
        self.bdd_syntagme_ssml_csv = self.results_dir / "BDD_syntagme_ssml.csv"
        self.bdd_syntagme_synth_csv = self.results_dir / "BDD_syntagme_for_synth.csv"

        for d in [
            self.raw_synth_dir,
            self.ssml_dir,
            self.xml_dir,
            self.audio_out,
            self.audio_ssml_dir,
            self.results_dir,
        ]:
            d.mkdir(parents=True, exist_ok=True)

        self.tts = tts or self._make_tts()
        self.last_measure: MeasureResult | None = None
        self._pos_backend = None

    @property
    def pos_backend(self):
        """POS backend per cfg.pos_backend: "lexicon" (fr_pos, default) or
        "contextual" (models/pos_tagger packaged checkpoint) — the spaCy
        replacement hook (Code/audioPipeline.py:26-27)."""
        if self._pos_backend is None:
            from ..models.pos_tagger import get_pos_backend

            self._pos_backend = get_pos_backend(self.cfg.pos_backend)
        return self._pos_backend

    def _make_tts(self) -> TTSBackend:
        if self.cfg.tts_backend == "fake":
            from ..tts.fake import FakeBackend

            return FakeBackend()
        from ..tts.azure import AzureBackend

        return AzureBackend(
            api_key=self.cfg.read_azure_key(),
            region=self.cfg.azure_region,
            voice=self.cfg.azure_voice_name,
        )

    # ------------------------------------------------------------------
    def _segment_files(self) -> list[Path]:
        return sorted((self.voice_dir / "audio").glob("*.wav"), key=segment_sort_key)

    # 1 ------------------------------------------------------------------
    def preprocess(self):
        """Denoise hook + silence split (Code/audioPipeline.py:155-177).

        Demucs is an external heavy model; per the reference's own fallback
        contract (demucs_process.py:33-39: any failure → copy the original)
        the default denoiser is identity. A custom denoiser can be plugged
        via cfg.raw['denoise_command'] (subprocess: in/out wav paths).
        """
        log.info(">>> Preprocess: denoise + silence-split")
        brute = None
        for cand in ("segment.wav", "segment_demucs.wav", "segment.mp3"):
            p = self.voice_dir / "brute" / cand
            if p.exists():
                brute = p
                break
        if brute is None:
            raise FileNotFoundError("No brute audio found for preprocessing")
        if brute.suffix == ".mp3":
            raise ValueError(
                "mp3 ingest requires ffmpeg; convert to wav first (the reference "
                "shells out to pydub/ffmpeg here)"
            )

        denoised = self.voice_dir / "brute" / "segment_denoised.wav"
        # a previous identity run may have left `denoised` HARDLINKED to the
        # original: writing through it would truncate the user's raw
        # recording in place (and shutil.copy would raise SameFileError), so
        # every branch starts from a clean slate
        denoised.unlink(missing_ok=True)
        cmd = self.cfg.raw.get("denoise_command")
        if self.cfg.raw.get("denoise") == "spectral":
            from ..audio.denoise import denoise as spectral_denoise

            try:
                write_wav(denoised, spectral_denoise(read_wav(brute)))
            except Exception as e:  # noqa: BLE001 — demucs fallback contract
                log.warning("spectral denoiser failed (%s); copying original", e)
                shutil.copy(brute, denoised)
        elif self.cfg.raw.get("denoise") == "mask":
            # learned vocal isolation (the Demucs role) — packaged MaskNet
            # checkpoint, or denoise_options: {weights_path: …}
            from ..audio.separate import MaskSeparator

            try:
                sep = MaskSeparator(**self.cfg.raw.get("denoise_options", {}))
                write_wav(denoised, sep.separate(read_wav(brute)))
            except Exception as e:  # noqa: BLE001 — demucs fallback contract
                log.warning("mask separator failed (%s); copying original", e)
                shutil.copy(brute, denoised)
        elif cmd:
            import subprocess

            try:
                subprocess.run(
                    [c.format(input=str(brute), output=str(denoised)) for c in cmd],
                    check=True,
                    timeout=3600,
                )
            except Exception as e:  # noqa: BLE001 — demucs fallback contract
                log.warning("denoise command failed (%s); copying original", e)
                shutil.copy(brute, denoised)
        else:
            # identity denoise: hardlink instead of copying the (tens of MB)
            # recording; neither path is ever mutated in place
            try:
                import os

                os.link(brute, denoised)
            except OSError:
                shutil.copy(brute, denoised)

        from ..ops.energy import split_on_silence_ranges

        with phase("preprocess/read"):
            audio = read_wav(denoised).to_mono()
        with phase("preprocess/vad"):
            ranges = split_on_silence_ranges(
                np.asarray(audio.samples, np.float32),
                audio.rate,
                self.cfg.silence.min_silence_len,
                self.cfg.silence.silence_thresh,
                self.cfg.silence.keep_silence,
            )
        out_dir = self.voice_dir / "audio"
        out_dir.mkdir(parents=True, exist_ok=True)
        with phase("preprocess/write_segments"):
            for i, (s, e) in enumerate(ranges):
                write_wav(out_dir / f"segment_ph{i + 1}.wav", audio.slice_ms(s, e))
        log.info("silence split: %d segments", len(ranges))

        # the natural corpus is final from this point — start its (async)
        # device transfer now so it streams behind the align/raw-synthesis
        # host work instead of landing on the measure critical path
        from ..prosody.measure import prefetch_corpus

        prefetch_corpus(self._segment_files())

    # 2 ------------------------------------------------------------------
    def align_and_transcribe(self):
        """Aligner → TextGrids + transcripts (Code/audioPipeline.py:179-241).

        With aligner=precomputed, existing TextGrids are used as-is (the
        resume path); other aligners regenerate them. Raw transcripts keep
        punctuation; the cleaned ones get the spurious-comma filter.
        """
        log.info(">>> Align & Transcribe (%s)", self.cfg.aligner)
        tg_dir = self.textgrid_dir
        txt_dir = self.transcription_dir
        txt_raw_dir = self.transcription_raw_dir
        for d in (txt_dir, txt_raw_dir):
            d.mkdir(parents=True, exist_ok=True)

        seg_files = self._segment_files()
        if not seg_files:
            raise FileNotFoundError(f"no segments in {self.voice_dir / 'audio'}")

        # start streaming the natural corpus to the accelerator NOW — the
        # transfer progresses in the background behind this step's host work
        # and the measure stage consumes the already-resident buffer
        from ..prosody.measure import prefetch_corpus

        prefetch_corpus(seg_files)

        if self.cfg.aligner != "precomputed":
            shutil.rmtree(tg_dir, ignore_errors=True)
        tg_dir.mkdir(parents=True, exist_ok=True)

        aligner = get_aligner(
            self.cfg.aligner,
            **(
                {"textgrid_dir": tg_dir}
                if self.cfg.aligner == "precomputed"
                else self.cfg.raw.get("aligner_options", {})
            ),
        )

        # corpus-batched aligners (WhisperAligner.align_batch) process every
        # segment in a handful of device launches instead of one set per
        # segment; others align per segment
        batch_tgs: dict[str, TextGrid] = {}
        if self.cfg.aligner != "precomputed" and hasattr(aligner, "align_batch"):
            # flush in bounded groups (~6 min of 44.1 kHz audio ≈ 64 MB f32)
            # so an hour-long corpus never sits fully decoded in host RAM;
            # each flush still amortizes launches over many segments
            cap = 16_000_000  # samples per group
            group: list[tuple[str, Audio, str | None]] = []

            def flush():
                if not group:
                    return
                stems = [g[0] for g in group]
                tgs = aligner.align_batch([g[1] for g in group], [g[2] for g in group])
                batch_tgs.update(zip(stems, tgs))
                group.clear()

            for wav_path in seg_files:
                a = read_wav(wav_path).to_mono()
                t_raw = txt_raw_dir / f"{wav_path.stem}.txt"
                tr = t_raw.read_text(encoding="utf-8").strip() if t_raw.exists() else None
                group.append((wav_path.stem, a, tr))
                if sum(g[1].samples.size for g in group) >= cap:
                    flush()
            flush()

        for wav_path in seg_files:
            stem = wav_path.stem
            tg_path = tg_dir / f"{stem}.TextGrid"
            if self.cfg.aligner == "precomputed":
                if not tg_path.exists():
                    raise FileNotFoundError(
                        f"aligner=precomputed but {tg_path} missing; run a real aligner"
                    )
                tg = aligner.for_segment(stem).align(None)
            elif stem in batch_tgs:
                tg = batch_tgs[stem]
                write_textgrid(tg, tg_path)
            else:
                audio = read_wav(wav_path).to_mono()
                transcript = None
                t_raw = txt_raw_dir / f"{stem}.txt"
                if t_raw.exists():
                    transcript = t_raw.read_text(encoding="utf-8").strip()
                tg = aligner.align(audio, transcript)
                write_textgrid(tg, tg_path)

            words = " ".join(iv.mark.strip() for iv in tg.tiers[0] if iv.mark.strip())
            raw_txt = txt_raw_dir / f"{stem}.txt"
            if not raw_txt.exists():
                raw_txt.write_text(words or "...", encoding="utf-8")
            from ..utils.text import clean_transcript

            cleaned = self.pos_backend.remove_spurious_commas(clean_transcript(words))
            (txt_dir / f"{stem}.txt").write_text(cleaned, encoding="utf-8")

    # 3 ------------------------------------------------------------------
    def raw_synthesis(self):
        """Plain (no-prosody) synthesis of each segment's raw transcript
        into <name>_raw (Code/Preprocessing/get_synth.py:10-51)."""
        log.info(">>> Raw synthesis")
        out_audio = self.raw_audio_dir
        out_txt = self.raw_synth_dir / "transcription"
        out_audio.mkdir(parents=True, exist_ok=True)
        out_txt.mkdir(parents=True, exist_ok=True)
        from ..prosody.measure import prefetch_corpus, prefetch_segment
        from ..utils.wavio import wav_info

        seg_files = self._segment_files()
        try:
            nat_rate = wav_info(seg_files[0])[1] if seg_files else None
        except (OSError, ValueError):
            nat_rate = None
        for wav_path in seg_files:
            stem = wav_path.stem
            src = self.transcription_raw_dir / f"{stem}.txt"
            if not src.exists():
                log.warning("no raw transcript for %s; skipping raw synth", stem)
                continue
            text = src.read_text(encoding="utf-8").strip()
            (out_txt / f"{stem}.txt").write_text(text, encoding="utf-8")
            ssml = (
                "<speak version='1.0' xmlns='http://www.w3.org/2001/10/synthesis' "
                "xmlns:mstts=\"https://www.w3.org/2001/mstts\" xml:lang='fr-FR'>"
                f"<voice name='{self.cfg.azure_voice_name}'>{text}</voice></speak>"
            )
            audio = self.tts.synthesize(ssml)
            out_path = out_audio / f"{stem}.wav"
            write_wav(out_path, audio)
            # each segment's device upload streams behind the synthesis of
            # the ones after it — by measure time the corpus is resident
            prefetch_segment(out_path, rate_expect=nat_rate)

        # assemble the raw corpus batch on device from the per-segment rows
        # (or start the normal compact upload on a miss; must mirror
        # prepare_voice's path/rate arguments so the prefetch key matches)
        if seg_files:
            raw_paths = [out_audio / f"{p.stem}.wav" for p in seg_files]
            prefetch_corpus(
                [p if p.exists() else None for p in raw_paths], rate_expect=nat_rate
            )

    # 4 ------------------------------------------------------------------
    def measure_prosody_and_build_ssml(self):
        """The numerical core (Code/audioPipeline.py:261-711) — one batched
        device program via prosody.measure, then CSV emission."""
        log.info(">>> Measure prosody & build SSML")
        seg_files = self._segment_files()
        if not seg_files:
            log.error("No audio segments found!")
            return
        result = measure_voice(
            seg_files,
            self.textgrid_dir,
            self.raw_audio_dir,
            self.cfg.prosody,
            clean_word=self.pos_backend.remove_spurious_commas,
            pos_of_factory=self.pos_backend.pos_of_factory,
        )
        self.emit_measure_csvs(result)

    def emit_measure_csvs(self, result):
        """Render a MeasureResult into the three BDD CSVs (the batched
        multi-voice runner injects precomputed results here)."""
        self.last_measure = result
        voice = self.cfg.azure_voice_name
        factor = self.cfg.prosody.inter_syntagme_pause_factor

        # 4a segment-level (Code/audioPipeline.py:604-647)
        pieces_by_seg: dict[str, list[str]] = {}
        for row in result.rows:
            piece = ssml_emit.prosody_piece(
                row.syntagme, row.pause, row.pitch_smooth, row.rate_smooth, row.raw_volume, factor
            )
            pieces_by_seg.setdefault(row.segment, []).append(piece)
        with open(self.bdd_ssml_csv, "w", newline="", encoding="utf-8") as f:
            w = csv.DictWriter(f, fieldnames=["segment", "ssml"])
            w.writeheader()
            for seg, pieces in pieces_by_seg.items():
                w.writerow({"segment": seg, "ssml": ssml_emit.segment_ssml(pieces, voice)})

        # 4b syntagme-level training CSV (Code/audioPipeline.py:649-682)
        with open(self.bdd_syntagme_ssml_csv, "w", newline="", encoding="utf-8") as f:
            w = csv.DictWriter(f, fieldnames=["segment", "syntagme", "pause", "ssml"])
            w.writeheader()
            for row in result.rows:
                piece = ssml_emit.prosody_piece(
                    row.syntagme, row.pause, row.pitch_smooth, row.rate_smooth, row.raw_volume, factor
                )
                w.writerow(
                    {
                        "segment": row.segment,
                        "syntagme": row.syntagme,
                        "pause": row.pause,
                        "ssml": ssml_emit.syntagme_ssml(piece, voice),
                    }
                )

        # 4c no-break synthesis CSV (Code/audioPipeline.py:684-711)
        with open(self.bdd_syntagme_synth_csv, "w", newline="", encoding="utf-8") as f:
            w = csv.DictWriter(f, fieldnames=["segment", "syntagme", "pause", "ssml"])
            w.writeheader()
            for row in result.rows:
                piece = ssml_emit.prosody_piece(
                    row.syntagme,
                    row.pause,
                    row.pitch_smooth,
                    row.rate_smooth,
                    row.raw_volume,
                    factor,
                    include_break=False,
                )
                w.writerow(
                    {
                        "segment": row.segment,
                        "syntagme": row.syntagme,
                        "pause": row.pause,
                        "ssml": ssml_emit.syntagme_ssml_no_break(piece, voice),
                    }
                )

    # 5 ------------------------------------------------------------------
    def synthesize_and_merge(self):
        """Per-syntagme synthesis + exact-pause stitching
        (Code/audioPipeline.py:715-838)."""
        log.info(">>> Synthesize & merge")
        shutil.rmtree(self.xml_dir, ignore_errors=True)
        self.xml_dir.mkdir(parents=True, exist_ok=True)
        shutil.rmtree(self.audio_out, ignore_errors=True)
        self.audio_out.mkdir(parents=True, exist_ok=True)
        shutil.rmtree(self.audio_ssml_dir, ignore_errors=True)
        self.audio_ssml_dir.mkdir(parents=True, exist_ok=True)

        with open(self.bdd_syntagme_synth_csv, newline="", encoding="utf-8") as f:
            rows = list(csv.DictReader(f))

        import re as _re

        chunks: dict[int, Audio | None] = {}
        content_idx = 0
        with phase("merge/tts"):
            for row in rows:
                txt = (row.get("syntagme") or "").strip()
                if txt and _re.search(r"\w", txt):
                    if txt == "...":
                        continue
                    (self.xml_dir / f"{content_idx:04d}.xml").write_text(row["ssml"], encoding="utf-8")
                    try:
                        audio = self.tts.synthesize(row["ssml"])
                        write_wav(self.audio_out / f"{content_idx:04d}.wav", audio)
                        chunks[content_idx] = audio
                    except Exception as e:  # noqa: BLE001 — degrade to silence
                        log.warning("TTS failed for %r: %s", txt, e)
                        chunks[content_idx] = None
                    content_idx += 1

        sr = getattr(self.tts, "sample_rate", 44100)
        with phase("merge/stitch"):
            result = stitch_rows(rows, chunks, sr, self.cfg.prosody.end_punctuation_pause_ms)
        with phase("merge/write"):
            for seg, audio in result.segments.items():
                write_wav(self.audio_ssml_dir / f"{seg}.wav", audio)
            write_wav(self.results_dir / "OUT.wav", result.out)
        log.info("merged OUT.wav: %.1f s", result.out.duration_seconds)

    # 6 ------------------------------------------------------------------
    def export_training_json(self):
        """(text → tagged-SSML) training JSON + cross-voice bdd.json
        (Code/Pipeline/create_training_data.py)."""
        log.info(">>> Export training JSON")
        with open(self.bdd_syntagme_ssml_csv, newline="", encoding="utf-8") as f:
            rows = list(csv.DictReader(f))
        write_training_json(rows, self.results_dir / f"training_data_{self.name}.json")
        combine_training_data(self.out_dir / "results", self.out_dir / "results" / "bdd.json")

    # 7 ------------------------------------------------------------------
    def final_transcribe(self):
        """Re-align the merged OUT.wav → OUT.TextGrid
        (Code/audioPipeline.py:856-892). Uses the energy aligner against
        the known syntagme text when no ASR aligner is configured."""
        log.info(">>> Final transcribe")
        out_wav = self.results_dir / "OUT.wav"
        if not out_wav.exists():
            log.error("No OUT.wav found at %s", out_wav)
            return
        audio = read_wav(out_wav).to_mono()
        with open(self.bdd_syntagme_synth_csv, newline="", encoding="utf-8") as f:
            text = " ".join(
                (r.get("syntagme") or "").strip() for r in csv.DictReader(f) if (r.get("syntagme") or "").strip()
            )
        if self.cfg.aligner in ("precomputed", "energy"):
            from ..align.energy import EnergyAligner

            tg = EnergyAligner().align(audio, text)
        else:
            aligner = get_aligner(self.cfg.aligner, **self.cfg.raw.get("aligner_options", {}))
            tg = aligner.align(audio, text)
        write_textgrid(tg, self.results_dir / "OUT.TextGrid")
        (self.results_dir / "transcription_final.txt").write_text(text, encoding="utf-8")

    # 8 ------------------------------------------------------------------
    def compare_breaks(self, tol_ms: int = 5):
        """Pause-fidelity check (Code/audioPipeline.py:895-1074)."""
        log.info(">>> Compare breaks")
        from ..eval.breaks import compare_breaks

        with open(self.bdd_syntagme_synth_csv, newline="", encoding="utf-8") as f:
            rows = list(csv.DictReader(f))
        from ..utils.textgridio import read_textgrid

        tg = read_textgrid(self.results_dir / "OUT.TextGrid")
        report = compare_breaks(rows, tg, tol_ms=tol_ms)
        with open(self.results_dir / "pause_comparison_full.csv", "w", newline="", encoding="utf-8") as f:
            w = csv.DictWriter(
                f,
                fieldnames=[
                    "segment",
                    "syntagme",
                    "nat_voice_ms",
                    "synth_voice_ms",
                    "diff_ms",
                    "ok",
                    "match_quality",
                ],
            )
            w.writeheader()
            for r in report.rows:
                w.writerow(r)
        log.info(
            "Breaks compared: %d; within ±%d ms: %d (%.1f%%); avg |diff| %.0f ms",
            report.total,
            tol_ms,
            report.within,
            100.0 * report.within / max(report.total, 1),
            report.avg_abs_diff,
        )
        return report

    # ------------------------------------------------------------------
    STEP_NAMES = [
        "Preprocess",
        "Align+Transcribe",
        "Raw Synthesis",
        "Measure & Build SSML",
        "Synthesize+Merge",
        "Export JSON",
        "Final Transcribe",
        "Compare Breaks",
    ]

    def run(self):
        steps = [
            ("Preprocess", self.preprocess),
            ("Align+Transcribe", self.align_and_transcribe),
            ("Raw Synthesis", self.raw_synthesis),
            ("Measure & Build SSML", self.measure_prosody_and_build_ssml),
            ("Synthesize+Merge", self.synthesize_and_merge),
            ("Export JSON", self.export_training_json),
            ("Final Transcribe", self.final_transcribe),
            ("Compare Breaks", self.compare_breaks),
        ]
        to_run = self.cfg.steps_to_run or [n for n, _ in steps]
        from .profiling import StepTimer

        timer = StepTimer()
        for name, fn in [(n, f) for n, f in steps if n in to_run]:
            log.info("[%s] step: %s", self.name, name)
            try:
                with timer.step(name, voice=self.name):
                    fn()
            except Exception:
                log.exception("Failed step %s", name)
                timer.dump(self.results_dir / "step_timings.jsonl")
                raise
        # run provenance: config + per-step timings (the reference dumps
        # used_config.yaml only, Code/audioPipeline.py:1099-1103)
        cfg_path = self.results_dir / "used_config.yaml"
        with open(cfg_path, "w", encoding="utf-8") as f:
            yaml.dump(self.cfg.raw, f, default_flow_style=False, allow_unicode=True)
        timer.dump(self.results_dir / "step_timings.jsonl")
        log.info("Config saved to %s", cfg_path)


def run_pipeline_for_voice(name: str, cfg: PipelineConfig, tts: TTSBackend | None = None):
    """Per-voice driver with the reference's isolation contract: a failure
    in one voice is reported, not propagated (Code/audioPipeline.py:1105-1119)."""
    logger = logging.getLogger()
    logger.info("--- Starting pipeline for: %s ---", name)
    try:
        AudioPipeline(name, cfg, tts=tts).run()
        logger.info("--- Finished pipeline for: %s ---", name)
        return True, name
    except Exception as e:  # noqa: BLE001
        logger.error("--- Pipeline failed for: %s ---", name)
        logger.exception(e)
        return False, name


def main(argv: list[str] | None = None):
    import argparse

    from .config import load_config

    ap = argparse.ArgumentParser(description="TPU-native prosody-control pipeline")
    ap.add_argument("--config", default="config.yaml")
    ap.add_argument("--voices", nargs="*", help="override voice_names")
    args = ap.parse_args(argv)
    cfg = load_config(args.config)
    setup_logging(cfg.out_path)
    voices = args.voices or cfg.voice_names
    if not voices:
        print("Missing 'voice_names' in config.yaml", file=sys.stderr)
        sys.exit(1)
    if cfg.multiprocessing and len(voices) > 1:
        # the reference's process pool maps to the cross-voice batched
        # measure (one device program for every voice's segments)
        from .batch_runner import run_all_voices

        cfg.voice_names = list(voices)
        results = run_all_voices(cfg)
    else:
        results = [run_pipeline_for_voice(v, cfg) for v in voices]
    failed = [n for ok, n in results if not ok]
    if failed:
        print(f"Some pipelines failed: {', '.join(failed)}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
