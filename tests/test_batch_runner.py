"""Multi-voice batched measure: identical to per-voice, through one device
program; run_all_voices end-to-end over two voices."""

import csv

import numpy as np
import pytest

from prosody_control_french_tts_tpu.core.config import PipelineConfig
from prosody_control_french_tts_tpu.core.batch_runner import measure_all_voices, run_all_voices
from prosody_control_french_tts_tpu.core.pipeline import AudioPipeline
from prosody_control_french_tts_tpu.tts.fake import FakeBackend
from prosody_control_french_tts_tpu.utils import wavio
from prosody_control_french_tts_tpu.utils.textgridio import word_tier_with_silences, write_textgrid

SR = 44100

VOICES = {
    "va": [["bonjour", "tout", "le", "monde."], ["quelle", "belle", "journée."]],
    "vb": [["la", "voix", "change", "beaucoup."]],
}


@pytest.fixture(scope="module")
def two_voice_base(tmp_path_factory):
    base = tmp_path_factory.mktemp("mv")
    gen = FakeBackend(seed=11)
    for voice, segments in VOICES.items():
        vdir = base / "Data" / "voice" / voice
        (vdir / "audio").mkdir(parents=True)
        (vdir / "transcription_raw").mkdir(parents=True)
        tgd = vdir / "WhisperTS_textgrid_files"
        tgd.mkdir()
        for si, words in enumerate(segments, start=1):
            chunks, times, t = [], [], 0.0
            for w in words:
                a = gen._voice(w, 4.0, 0.0, 0.0)
                times.append((t, t + len(a) / SR, w))
                t += len(a) / SR
                chunks.append(a)
                chunks.append(np.zeros(int(0.25 * SR)))
                t += 0.25
            x = np.concatenate(chunks)
            wavio.write_wav(vdir / "audio" / f"segment_ph{si}.wav", x, SR)
            write_textgrid(word_tier_with_silences(times, len(x) / SR), tgd / f"segment_ph{si}.TextGrid")
            (vdir / "transcription_raw" / f"segment_ph{si}.txt").write_text(" ".join(words))
    cfg = PipelineConfig.from_dict(
        {"data_dir": "Data/voice", "out_dir": "Out", "voice_names": list(VOICES),
         "tts_backend": "fake", "aligner": "precomputed", "multiprocessing": True,
         "steps_to_run": ["Raw Synthesis", "Measure & Build SSML", "Synthesize+Merge",
                           "Export JSON", "Final Transcribe", "Compare Breaks"]},
        base,
    )
    return base, cfg


class TestBatchedMeasure:
    def test_matches_per_voice(self, two_voice_base):
        base, cfg = two_voice_base
        pipes = [AudioPipeline(n, cfg, tts=FakeBackend(seed=1)) for n in VOICES]
        for p in pipes:
            p.raw_synthesis()
        batched = measure_all_voices(pipes)
        for p in pipes:
            single = __import__(
                "prosody_control_french_tts_tpu.prosody.measure", fromlist=["measure_voice"]
            ).measure_voice(p._segment_files(), p.textgrid_dir, p.raw_audio_dir, cfg.prosody)
            b = batched[p.name]
            assert len(b.rows) == len(single.rows)
            for rb, rs in zip(b.rows, single.rows):
                assert rb.syntagme == rs.syntagme
                assert abs(rb.raw_pitch - rs.raw_pitch) < 1e-3
                assert abs(rb.raw_volume - rs.raw_volume) < 1e-3
                assert abs(rb.raw_rate - rs.raw_rate) < 1e-3
                assert abs(rb.pitch_smooth - rs.pitch_smooth) < 1e-3

    def test_run_all_voices(self, two_voice_base):
        base, cfg = two_voice_base
        results = run_all_voices(cfg, tts=FakeBackend(seed=2))
        assert all(ok for ok, _ in results)
        for voice in VOICES:
            res = base / "Out" / "results" / voice
            assert (res / "OUT.wav").exists()
            with open(res / "BDD_syntagme_ssml.csv", newline="", encoding="utf-8") as f:
                assert len(list(csv.DictReader(f))) > 0


class TestMultiBucketAsync:
    def test_cross_bucket_groups_match_per_voice(self, tmp_path):
        """Voices whose segments land in DIFFERENT length buckets exercise
        the multi-group async dispatch path of measure_voices_batched
        (all groups launched before any drain) — results must still be
        bit-comparable to per-voice runs."""
        from prosody_control_french_tts_tpu.prosody.measure import (
            bucket_length,
            measure_voice,
            measure_voices_batched,
            prepare_voice,
        )

        gen = FakeBackend(seed=21)
        voices = {"short": ["un", "mot."], "long": ["une", "phrase", "beaucoup", "plus",
                                                    "longue", "avec", "des", "mots."]}
        prep_inputs = {}
        for voice, words in voices.items():
            vdir = tmp_path / voice
            (vdir / "audio").mkdir(parents=True)
            (vdir / "raw").mkdir()
            tgd = vdir / "tg"
            tgd.mkdir()
            chunks, times, t = [], [], 0.0
            # pad the long voice with trailing silence to push it into a
            # bigger bucket than the short one
            for w in words:
                a = gen._voice(w, 2.0, 0.0, 0.0)
                times.append((t, t + len(a) / SR, w))
                t += len(a) / SR
                chunks.append(a)
                chunks.append(np.zeros(int(0.3 * SR)))
                t += 0.3
            if voice == "long":
                chunks.append(np.zeros(8 * SR))
                t += 8.0
            x = np.concatenate(chunks)
            wavio.write_wav(vdir / "audio" / "segment_ph1.wav", x, SR)
            write_textgrid(word_tier_with_silences(times, len(x) / SR), tgd / "segment_ph1.TextGrid")
            # raw synthesis stand-in: same text through the fake backend
            raw = gen._voice(" ".join(words), 0.0, 0.0, 0.0)
            wavio.write_wav(vdir / "raw" / "segment_ph1.wav", raw, SR)
            prep_inputs[voice] = ([vdir / "audio" / "segment_ph1.wav"], tgd, vdir / "raw")

        from prosody_control_french_tts_tpu.prosody.adjust import ProsodySettings

        settings = ProsodySettings()
        preps = {v: prepare_voice(*args, settings) for v, args in prep_inputs.items()}
        buckets = {v: p.nat.shape[1] for v, p in preps.items()}
        assert buckets["short"] != buckets["long"], buckets  # two groups

        batched = measure_voices_batched(preps, settings)
        for v, args in prep_inputs.items():
            single = measure_voice(*args, settings)
            assert len(batched[v].rows) == len(single.rows)
            for rb, rs in zip(batched[v].rows, single.rows):
                assert rb.syntagme == rs.syntagme
                assert abs(rb.raw_pitch - rs.raw_pitch) < 1e-3
                assert abs(rb.raw_volume - rs.raw_volume) < 1e-3
