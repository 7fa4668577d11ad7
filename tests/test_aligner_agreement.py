"""Real-audio alignment evidence without gold labels (round-4 item 3).

The packaged aligners were trained on synthetic French; no gold word
boundaries exist for the bundled REAL corpus. These tests pin the
label-free evidence the harness (eval/real_audio_agreement.py) produces —
the same framing as the reference's gold harness
(Code/whisper_testing/splitting.py:130-252):

- the packaged Whisper's real-French decode instability: WER against a
  NOMINAL French text (no gold transcripts ship with the corpus — the
  stand-in only anchors the metric; any fluent French reference yields
  the same ≈2-4 regime against hallucinated output). A stability canary
  for the free-decode regime, not an accuracy measurement;
- whisper-DTW boundaries are nonetheless ACOUSTICALLY consistent: ~99 % of
  detected speech is covered by word intervals and <5 % of word mass falls
  in silence;
- cross-aligner boundary deltas on the same transcript are recorded as a
  drift canary (whisper-vs-energy ≈ 200 ms median on this corpus).
"""

import numpy as np
import pytest

from prosody_control_french_tts_tpu.eval.real_audio_agreement import (
    boundary_deltas_ms,
    corpus_agreement_report,
    segment_agreement,
    silence_consistency,
)
from prosody_control_french_tts_tpu.utils.textgridio import word_tier_with_silences
from prosody_control_french_tts_tpu.utils.wavio import Audio, read_wav

# NOMINAL reference texts (plausible fluent French of roughly the right
# length) — NOT transcriptions of the recordings; the corpus ships without
# gold text. They anchor the WER proxy: a synthetic-trained ASR that
# hallucinates scores ≈2-4 against ANY fluent reference, and a sudden drop
# toward 0 would mean the harness stopped free-decoding.
REFS = {
    "segment_ph2": "bonjour et bienvenue dans cette nouvelle emission consacree a la musique",
    "segment_ph3": "nous allons parler aujourd'hui des grands compositeurs francais du siecle dernier",
}


class TestHarnessUnits:
    def test_boundary_deltas(self):
        a = word_tier_with_silences([(0.0, 0.5, "un"), (0.6, 1.0, "deux")], 1.2)
        b = word_tier_with_silences([(0.1, 0.5, "un"), (0.6, 1.1, "deux")], 1.2)
        d = boundary_deltas_ms(a, b)
        assert d.shape == (4,)
        assert np.isclose(sorted(d)[-1], 100.0, atol=1.0)

    def test_boundary_deltas_word_count_mismatch(self):
        a = word_tier_with_silences([(0.0, 0.5, "un")], 1.0)
        b = word_tier_with_silences([(0.0, 0.4, "un"), (0.5, 0.9, "deux")], 1.0)
        with pytest.raises(ValueError):
            boundary_deltas_ms(a, b)

    def test_silence_consistency_perfect(self):
        sr = 16000
        x = np.zeros(sr * 2, np.float32)
        x[sr // 2 : sr] = np.sin(np.linspace(0, 800 * np.pi, sr // 2)).astype(np.float32) * 0.5
        tg = word_tier_with_silences([(0.5, 1.0, "mot")], 2.0)
        s = silence_consistency(tg, x, sr)
        assert s["word_time_in_silence"] < 0.15
        assert s["speech_covered_by_words"] > 0.85

    def test_silence_consistency_bad_alignment(self):
        sr = 16000
        x = np.zeros(sr * 2, np.float32)
        x[sr // 2 : sr] = np.sin(np.linspace(0, 800 * np.pi, sr // 2)).astype(np.float32) * 0.5
        tg = word_tier_with_silences([(1.2, 1.9, "mot")], 2.0)  # word in silence
        s = silence_consistency(tg, x, sr)
        assert s["word_time_in_silence"] > 0.8
        assert s["speech_covered_by_words"] < 0.2


class TestRealCorpusAgreement:
    """2 real segments (runtime-bounded on this 1-vCPU host); the full
    10-segment table lives in ROADMAP.md."""

    @pytest.fixture(scope="class")
    def report(self, corpus_wavs):
        wavs = [w for w in corpus_wavs if w.stem in REFS]
        assert len(wavs) == 2
        return corpus_agreement_report(wavs, REFS)

    def test_honest_wer_recorded(self, report):
        """The synthetic-trained ASR transcribes real French BADLY — the
        number must exist and stay in its known (bad) regime; a sudden
        drop to ~0 would mean the harness stopped free-decoding."""
        wer = report["summary"]["wer_median"]
        assert wer is not None
        assert 0.5 < wer < 8.0, report["summary"]

    def test_whisper_boundaries_acoustically_consistent(self, report):
        s = report["summary"]
        assert s["whisper_word_time_in_silence"] < 0.05, s
        assert s["whisper_speech_covered"] > 0.90, s

    def test_cross_aligner_deltas_recorded(self, report):
        s = report["summary"]
        # drift canaries, not quality claims: teacher-forcing on the ASR
        # transcript keeps all three word sequences identical
        assert s["whisper_energy_median_ms"] < 600, s
        assert s["whisper_ctc_median_ms"] is not None
        assert s["ctc_energy_median_ms"] is not None

    def test_per_segment_rows_complete(self, report):
        for row in report["segments"]:
            assert row["n_words"] >= 10
            assert "whisper_ctc_median_ms" in row
            assert "whisper_word_time_in_silence" in row
