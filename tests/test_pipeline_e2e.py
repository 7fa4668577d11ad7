"""End-to-end pipeline slice (SURVEY.md §7 step 4): synthetic voice corpus
→ measure → SSML CSVs → fake-TTS synthesis → stitched OUT.wav → training
JSON → break comparison. Hermetic: FakeBackend TTS, known TextGrids."""

import csv
import json
import re
from pathlib import Path

import numpy as np
import pytest
import yaml

from prosody_control_french_tts_tpu.core.config import PipelineConfig
from prosody_control_french_tts_tpu.core.pipeline import AudioPipeline
from prosody_control_french_tts_tpu.tts.fake import FakeBackend
from prosody_control_french_tts_tpu.utils import wavio
from prosody_control_french_tts_tpu.utils.textgridio import (
    read_textgrid,
    word_tier_with_silences,
    write_textgrid,
)

SR = 44100

SEGMENTS = {
    "segment_ph1": [
        ("bonjour", 0), ("tout", 0), ("le", 0), ("monde.", 400),
        ("nous", 0), ("parlons", 0), ("ensemble", 250), ("aujourd'hui.", 0),
    ],
    "segment_ph2": [
        ("la", 0), ("voix", 0), ("naturelle", 300), ("change", 0),
        ("beaucoup.", 500), ("merci", 0), ("beaucoup.", 0),
    ],
}


def synth_segment(words_pauses, backend):
    """Generate 'natural' audio word by word, recording exact timings."""
    chunks, times = [], []
    cursor = 0.0
    for word, pause_ms in words_pauses:
        a = backend._voice(word, pitch_pct=5.0, rate_pct=0.0, volume_pct=0.0)
        t0 = cursor
        cursor += len(a) / SR
        times.append((t0, cursor, word))
        chunks.append(a)
        if pause_ms:
            chunks.append(np.zeros(int(pause_ms * SR / 1000)))
            cursor += pause_ms / 1000.0
    return np.concatenate(chunks), times


@pytest.fixture(scope="module")
def voice_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("voicebase")
    name = "testvoice"
    vdir = base / "Data" / "voice" / name
    (vdir / "audio").mkdir(parents=True)
    (vdir / "transcription_raw").mkdir(parents=True)
    tg_dir = vdir / "WhisperTS_textgrid_files"
    tg_dir.mkdir(parents=True)
    gen = FakeBackend(seed=7)
    for seg, wp in SEGMENTS.items():
        x, times = synth_segment(wp, gen)
        wavio.write_wav(vdir / "audio" / f"{seg}.wav", x, SR)
        tg = word_tier_with_silences(times, total_duration=len(x) / SR)
        write_textgrid(tg, tg_dir / f"{seg}.TextGrid")
        (vdir / "transcription_raw" / f"{seg}.txt").write_text(
            " ".join(w for w, _ in wp), encoding="utf-8"
        )
    cfg = PipelineConfig.from_dict(
        {
            "data_dir": "Data/voice",
            "out_dir": "Out",
            "voice_names": [name],
            "azure_voice_name": "fr-FR-HenriNeural",
            "silence": {"min_silence_len": 1000, "silence_thresh": -50, "keep_silence": 300},
            "prosody_settings": {
                "baseline_window": 10,
                "pitch_semitones": 1.3,
                "volume_pct": 10.0,
                "rate_percent": 10.0,
                "smoothing_alpha": 0.2,
                "max_jump_percent": 8,
                "end_punctuation_pause_ms": 500,
                "inter_syntagme_pause_factor": 1,
            },
            "tts_backend": "fake",
            "aligner": "precomputed",
        },
        base,
    )
    return name, cfg


@pytest.fixture(scope="module")
def ran_pipeline(voice_dirs):
    name, cfg = voice_dirs
    pipe = AudioPipeline(name, cfg, tts=FakeBackend(seed=1))
    for step in [
        "Raw Synthesis",
        "Measure & Build SSML",
        "Synthesize+Merge",
        "Export JSON",
        "Final Transcribe",
        "Compare Breaks",
    ]:
        dict(
            [
                ("Raw Synthesis", pipe.raw_synthesis),
                ("Measure & Build SSML", pipe.measure_prosody_and_build_ssml),
                ("Synthesize+Merge", pipe.synthesize_and_merge),
                ("Export JSON", pipe.export_training_json),
                ("Final Transcribe", pipe.final_transcribe),
                ("Compare Breaks", pipe.compare_breaks),
            ]
        )[step]()
    return pipe


class TestMeasure:
    def test_csvs_exist_with_schema(self, ran_pipeline):
        p = ran_pipeline
        for path in (p.bdd_ssml_csv, p.bdd_syntagme_ssml_csv, p.bdd_syntagme_synth_csv):
            assert path.exists()
        with open(p.bdd_syntagme_ssml_csv, newline="", encoding="utf-8") as f:
            rows = list(csv.DictReader(f))
        assert {"segment", "syntagme", "pause", "ssml"} <= set(rows[0].keys())
        assert len(rows) >= 6

    def test_ssml_format_matches_reference(self, ran_pipeline):
        """Tag shape parity: <prosody pitch="+X.XX%" rate=".." volume="..">
        (Code/audioPipeline.py:609-624 formatting)."""
        with open(ran_pipeline.bdd_syntagme_ssml_csv, newline="", encoding="utf-8") as f:
            rows = list(csv.DictReader(f))
        pat = re.compile(
            r'<prosody pitch="[+-]\d+\.\d{2}%" rate="[+-]\d+\.\d{2}%" volume="[+-]\d+\.\d{2}%">'
        )
        text_rows = [r for r in rows if r["syntagme"].strip()]
        assert text_rows
        for r in text_rows:
            assert pat.search(r["ssml"]), r["ssml"]
            assert r["ssml"].startswith('<speak xmlns="http://www.w3.org/2001/10/synthesis"')

    def test_pause_rows_have_breaks(self, ran_pipeline):
        with open(ran_pipeline.bdd_syntagme_ssml_csv, newline="", encoding="utf-8") as f:
            rows = list(csv.DictReader(f))
        pause_rows = [r for r in rows if not r["syntagme"].strip() and int(float(r["pause"])) >= 50]
        assert pause_rows
        for r in pause_rows:
            assert '<break time="' in r["ssml"]

    def test_adjustments_within_clamps(self, ran_pipeline):
        res = ran_pipeline.last_measure
        s = ran_pipeline.cfg.prosody
        for row in res.rows:
            # pitch clamp: [-(2^(P·0.7/12)-1), 2^(P/12)-1]·100
            up = (2 ** (s.pitch_semitones / 12) - 1) * 100
            dn = (2 ** (-s.pitch_semitones * s.pitch_lower_clip_factor / 12) - 1) * 100
            assert dn - 1e-3 <= row.raw_pitch <= up + 1e-3
            assert -s.volume_pct - 1e-3 <= row.raw_volume <= s.volume_pct + 1e-3
            assert -s.rate_percent * 1.5 - 1e-3 <= row.raw_rate <= s.rate_percent + 1e-3

    def test_smoothing_max_jump(self, ran_pipeline):
        res = ran_pipeline.last_measure
        sm = [r.pitch_smooth for r in res.rows]
        for a, b in zip(sm, sm[1:]):
            assert abs(b - a) <= ran_pipeline.cfg.prosody.max_jump_percent + 1e-4

    def test_pitch_measured_above_baseline_shift(self, ran_pipeline):
        """Natural audio was synthesized +5% above the fake backend's base
        F0 and the raw synthesis at 0% — the measured pitch adjustments
        must be centred near 0 (baseline is the natural median itself)."""
        res = ran_pipeline.last_measure
        text_rows = [r for r in res.rows if r.syntagme]
        assert any(abs(r.raw_pitch) < 5 for r in text_rows)


class TestSynthesizeAndMerge:
    def test_out_wav(self, ran_pipeline):
        out = ran_pipeline.results_dir / "OUT.wav"
        a = wavio.read_wav(out)
        assert a.duration_seconds > 2.0

    def test_segment_wavs(self, ran_pipeline):
        segs = list(ran_pipeline.audio_ssml_dir.glob("segment_ph*.wav"))
        assert len(segs) == len(SEGMENTS)

    def test_xml_files_written(self, ran_pipeline):
        xmls = list(ran_pipeline.xml_dir.glob("*.xml"))
        assert xmls
        content = xmls[0].read_text(encoding="utf-8")
        assert "<mstts:silence" in content and "<break" not in content

    def test_pause_silence_duration(self, ran_pipeline):
        """Stitched pauses are exact: total OUT duration ≥ sum of pauses."""
        with open(ran_pipeline.bdd_syntagme_synth_csv, newline="", encoding="utf-8") as f:
            rows = list(csv.DictReader(f))
        pause_ms = sum(
            int(float(r["pause"])) for r in rows if not (r["syntagme"] or "").strip()
        )
        out = wavio.read_wav(ran_pipeline.results_dir / "OUT.wav")
        assert out.duration_seconds * 1000 >= pause_ms


class TestTrainingExport:
    def test_training_json_schema(self, ran_pipeline):
        j = json.loads(
            (ran_pipeline.results_dir / f"training_data_{ran_pipeline.name}.json").read_text()
        )
        assert set(j.keys()) == {"x", "y"}
        assert set(j["y"].keys()) == {"parsed_sequence", "stripped_ssml", "raw_ssml"}
        types = {e["type"] for e in j["y"]["parsed_sequence"]}
        assert types <= {"text", "break"}
        text_entries = [e for e in j["y"]["parsed_sequence"] if e["type"] == "text"]
        assert all("prosody" in e for e in text_entries)
        assert re.match(r"[+-]\d+\.\d{2}%", text_entries[0]["prosody"]["pitch"])

    def test_bdd_combined(self, ran_pipeline):
        bdd = json.loads((ran_pipeline.out_dir / "results" / "bdd.json").read_text())
        assert ran_pipeline.name in bdd


class TestCompareBreaks:
    def test_report_csv(self, ran_pipeline):
        path = ran_pipeline.results_dir / "pause_comparison_full.csv"
        assert path.exists()
        with open(path, newline="", encoding="utf-8") as f:
            rows = list(csv.DictReader(f))
        assert rows, "expected at least one break comparison row"
        for r in rows:
            assert set(r.keys()) >= {"segment", "nat_voice_ms", "synth_voice_ms", "diff_ms"}

    def test_out_textgrid(self, ran_pipeline):
        tg = read_textgrid(ran_pipeline.results_dir / "OUT.TextGrid")
        words = [iv for iv in tg.tiers[0] if iv.mark.strip()]
        assert len(words) >= 5


class TestDeterminism:
    def test_measure_rerun_identical(self, voice_dirs):
        name, cfg = voice_dirs
        p1 = AudioPipeline(name, cfg, tts=FakeBackend(seed=1))
        p1.measure_prosody_and_build_ssml()
        first = p1.bdd_syntagme_ssml_csv.read_text()
        p1.measure_prosody_and_build_ssml()
        assert p1.bdd_syntagme_ssml_csv.read_text() == first


class TestPreprocessAndAlign:
    def test_silence_split_and_energy_align(self, tmp_path):
        base = tmp_path
        name = "v2"
        vdir = base / "Data" / "voice" / name
        (vdir / "brute").mkdir(parents=True)
        gen = FakeBackend(seed=3)
        seg1, _ = synth_segment([("salut", 0), ("les", 0), ("amis.", 0)], gen)
        seg2, _ = synth_segment([("quelle", 0), ("belle", 0), ("journée.", 0)], gen)
        gap = np.zeros(int(1.5 * SR))
        brute = np.concatenate([seg1, gap, seg2])
        wavio.write_wav(vdir / "brute" / "segment.wav", brute, SR)
        cfg = PipelineConfig.from_dict(
            {
                "data_dir": "Data/voice",
                "out_dir": "Out",
                "voice_names": [name],
                "tts_backend": "fake",
                "aligner": "energy",
                "silence": {"min_silence_len": 1000, "silence_thresh": -50, "keep_silence": 300},
            },
            base,
        )
        pipe = AudioPipeline(name, cfg, tts=FakeBackend(seed=1))
        pipe.preprocess()
        segs = sorted((vdir / "audio").glob("*.wav"))
        assert len(segs) == 2
        # provide transcripts (energy aligner is transcript-driven)
        (vdir / "transcription_raw").mkdir(exist_ok=True)
        for seg, txt in zip(segs, ["salut les amis.", "quelle belle journée."]):
            (vdir / "transcription_raw" / f"{seg.stem}.txt").write_text(txt, encoding="utf-8")
        pipe.align_and_transcribe()
        tgs = list((vdir / "WhisperTS_textgrid_files").glob("*.TextGrid"))
        assert len(tgs) == 2
        tg = read_textgrid(tgs[0])
        assert sum(1 for iv in tg.tiers[0] if iv.mark.strip()) == 3


# ---------------------------------------------------------------------------
# Packaged aligners driving the FULL pipeline. The reference runs its
# aligner as step 2 of the production pipeline (Code/audioPipeline.py:179-241)
# — not as a sidecar — so the packaged CTC/Whisper checkpoints must survive
# the whole 8-step loop: silence split → ASR/forced alignment → raw synth →
# measure → SSML synth/merge → export → final transcribe → break compare.
# ---------------------------------------------------------------------------

REAL_CORPUS = Path("/root/reference/Data/voice/records/audio")
REAL_TEXTS = {  # bundled-corpus transcripts (bench.py _E2E_TEXTS)
    "segment_ph2": "bonjour et bienvenue dans cette nouvelle emission consacree a la musique",
    "segment_ph3": "nous allons parler aujourd'hui des grands compositeurs francais du siecle dernier",
}


def _build_synth_voice(base: Path, name: str, sentences: list[str]) -> None:
    """brute/segment.wav at 16 kHz: synth_speech sentences joined by 1.5 s
    of silence (so Preprocess recovers one segment per sentence)."""
    from prosody_control_french_tts_tpu.align.synth_speech import SynthSpec, synth_sentence

    spec = SynthSpec()
    vdir = base / "Data" / "voice" / name
    (vdir / "brute").mkdir(parents=True)
    parts = []
    for i, s in enumerate(sentences):
        audio, _ = synth_sentence(s, spec, seed=900 + i)
        parts.append(audio)
        parts.append(np.zeros(int(1.5 * spec.sample_rate), np.float32))
    wavio.write_wav(vdir / "brute" / "segment.wav", np.concatenate(parts), spec.sample_rate)


def _aligner_cfg(base: Path, name: str, aligner: str) -> PipelineConfig:
    return PipelineConfig.from_dict(
        {
            "data_dir": "Data/voice",
            "out_dir": "Out",
            "voice_names": [name],
            "tts_backend": "fake",
            "aligner": aligner,
            "silence": {"min_silence_len": 1000, "silence_thresh": -50, "keep_silence": 300},
        },
        base,
    )


def _run_remaining_steps(pipe: AudioPipeline) -> None:
    pipe.cfg.steps_to_run = [s for s in AudioPipeline.STEP_NAMES if s != "Preprocess"]
    pipe.run()


def _assert_full_artifacts(base: Path, name: str, n_segments: int) -> None:
    vdir = base / "Data" / "voice" / name
    tgs = list((vdir / "WhisperTS_textgrid_files").glob("*.TextGrid"))
    assert len(tgs) == n_segments
    for tg_path in tgs:
        tg = read_textgrid(tg_path)
        assert sum(1 for iv in tg.tiers[0] if iv.mark.strip()) >= 1, tg_path
    results = base / "Out" / "results" / name
    assert (results / "OUT.wav").exists()
    assert (results / "OUT.TextGrid").exists()
    assert (results / "pause_comparison_full.csv").exists()
    assert (results / f"training_data_{name}.json").exists()


class TestPackagedAlignerPipelines:
    """Hermetic full-pipeline runs where the packaged checkpoints are the
    aligner — the synthetic voice is in the aligners' training distribution
    (align/synth_speech.py), so the whisper run exercises TRUE zero-transcript
    ASR and the CTC run exercises forced alignment."""

    SENTENCES = [
        "bonjour merci la maison est grand",
        "demain la musique commence ici",
    ]

    def test_whisper_full_pipeline_asr(self, tmp_path):
        """aligner: whisper, NO transcripts provided — the packaged model
        transcribes, DTW-aligns, and the pipeline runs to Compare Breaks."""
        name = "wv"
        _build_synth_voice(tmp_path, name, self.SENTENCES)
        cfg = _aligner_cfg(tmp_path, name, "whisper")
        pipe = AudioPipeline(name, cfg, tts=FakeBackend(seed=1))
        pipe.preprocess()
        segs = sorted((tmp_path / "Data" / "voice" / name / "audio").glob("*.wav"))
        assert len(segs) == len(self.SENTENCES)
        _run_remaining_steps(pipe)
        _assert_full_artifacts(tmp_path, name, len(self.SENTENCES))
        # ASR quality on in-distribution audio: most true words recovered
        txt_dir = tmp_path / "Data" / "voice" / name / "transcription_raw"
        got = " ".join(
            (txt_dir / f"{s.stem}.txt").read_text(encoding="utf-8") for s in segs
        ).split()
        truth = " ".join(self.SENTENCES).split()
        hits = sum(1 for w in truth if w in got)
        assert hits >= int(0.6 * len(truth)), (got, truth)

    def test_ctc_full_pipeline(self, tmp_path):
        """aligner: ctc (forced alignment — transcript-driven, like the
        reference's MFA/ctc-forced-aligner paths)."""
        name = "cv"
        _build_synth_voice(tmp_path, name, self.SENTENCES)
        cfg = _aligner_cfg(tmp_path, name, "ctc")
        pipe = AudioPipeline(name, cfg, tts=FakeBackend(seed=1))
        pipe.preprocess()
        vdir = tmp_path / "Data" / "voice" / name
        segs = sorted((vdir / "audio").glob("*.wav"))
        (vdir / "transcription_raw").mkdir(exist_ok=True)
        for seg, txt in zip(segs, self.SENTENCES):
            (vdir / "transcription_raw" / f"{seg.stem}.txt").write_text(txt, encoding="utf-8")
        _run_remaining_steps(pipe)
        _assert_full_artifacts(tmp_path, name, len(self.SENTENCES))


class TestPackagedAlignerRealCorpus:
    """Full pipeline on the BUNDLED REAL corpus (2 of the 10 reference
    segments, runtime-bounded on this 1-vCPU host) with the packaged
    aligners. Transcripts are provided, so whisper teacher-forces + DTWs
    and CTC force-aligns — the packaged ASR was trained on synthetic French
    and its free transcription of real French is measured separately
    (tests/test_aligner_agreement.py)."""

    @pytest.mark.parametrize("aligner", ["whisper", "ctc"])
    def test_full_pipeline_real_segments(self, tmp_path, aligner):
        if not REAL_CORPUS.is_dir():
            pytest.skip("bundled corpus not available")
        name = f"real_{aligner}"
        vdir = tmp_path / "Data" / "voice" / name
        (vdir / "audio").mkdir(parents=True)
        (vdir / "transcription_raw").mkdir(parents=True)
        for stem, txt in REAL_TEXTS.items():
            data = (REAL_CORPUS / f"{stem}.wav").read_bytes()
            (vdir / "audio" / f"{stem}.wav").write_bytes(data)
            (vdir / "transcription_raw" / f"{stem}.txt").write_text(txt, encoding="utf-8")
        cfg = _aligner_cfg(tmp_path, name, aligner)
        pipe = AudioPipeline(name, cfg, tts=FakeBackend(seed=1))
        _run_remaining_steps(pipe)
        _assert_full_artifacts(tmp_path, name, len(REAL_TEXTS))
        # word tiers must segment the real audio into >1 word per segment
        for stem in REAL_TEXTS:
            tg = read_textgrid(vdir / "WhisperTS_textgrid_files" / f"{stem}.TextGrid")
            words = [iv for iv in tg.tiers[0] if iv.mark.strip()]
            assert len(words) >= 5, (stem, len(words))


class TestRateMismatch:
    def test_raw_at_different_rate(self, tmp_path):
        """Raw synthesis at 24 kHz against a 44.1 kHz natural corpus must
        be resampled at ingest (Azure output formats are configurable)."""
        from prosody_control_french_tts_tpu.prosody.measure import measure_voice
        from prosody_control_french_tts_tpu.utils.wavio import resample, Audio

        gen = FakeBackend(seed=2)
        vdir = tmp_path / "v"
        (vdir / "audio").mkdir(parents=True)
        (vdir / "raw").mkdir()
        tgd = vdir / "tg"
        tgd.mkdir()
        words = ["bonjour", "le", "monde."]
        chunks, times, t = [], [], 0.0
        for w in words:
            a = gen._voice(w, 0, 0, 0)
            times.append((t, t + len(a) / SR, w))
            t += len(a) / SR
            chunks.append(a)
        x = np.concatenate(chunks)
        wavio.write_wav(vdir / "audio" / "segment_ph1.wav", x, SR)
        write_textgrid(word_tier_with_silences(times, len(x) / SR), tgd / "segment_ph1.TextGrid")
        low = resample(Audio(x, SR), 24000)
        wavio.write_wav(vdir / "raw" / "segment_ph1.wav", low)

        from prosody_control_french_tts_tpu.prosody.adjust import ProsodySettings

        res = measure_voice(
            sorted((vdir / "audio").glob("*.wav")), tgd, vdir / "raw", ProsodySettings()
        )
        text_rows = [r for r in res.rows if r.syntagme]
        assert text_rows
        # identical content → near-zero volume adjustment despite the rate gap
        assert all(abs(r.raw_volume) < 3.0 for r in text_rows), text_rows
