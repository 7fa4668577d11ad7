"""Legacy BDD1→BDD5 chain tests (Voc orchestrator + stage math)."""

import numpy as np
import pytest

from prosody_control_french_tts_tpu.legacy import bdd
from prosody_control_french_tts_tpu.legacy.voc import Voc
from prosody_control_french_tts_tpu.tts.fake import FakeBackend
from prosody_control_french_tts_tpu.utils import wavio
from prosody_control_french_tts_tpu.utils.textgridio import word_tier_with_silences, write_textgrid

SR = 44100


def make_rows(words, file="f", wav=None, t0=0.0, word_dur=0.3, pause_dur=0.2):
    rows = []
    t = t0
    for i, w in enumerate(words):
        dur = pause_dur if w == "" else word_dur
        rows.append(
            {
                "PhraseID": f"{file}_segment_{i}",
                "Start": t,
                "End": t + dur,
                "Duration": dur,
                "Text": w,
                "File": wav,
            }
        )
        t += dur
    return rows


class TestAlignAndBreaks:
    def test_identical_sequences(self):
        nat = make_rows(["bonjour", "", "monde"])
        syn = make_rows(["bonjour", "", "monde"])
        rows = bdd.align_rows(nat, syn)
        assert len(rows) == 3
        assert not any(r.is_gap_natural or r.is_gap_synthesized for r in rows)

    def test_gap_creates_break(self):
        nat = make_rows(["bonjour", "cher", "monde"])
        syn = make_rows(["bonjour", "monde"])
        rows = bdd.align_rows(nat, syn)
        gaps = [r for r in rows if r.is_gap_synthesized]
        assert len(gaps) == 1 and gaps[0].text == "cher"
        with_breaks = bdd.add_breaks(rows)
        pauses = [r for r in with_breaks if r.is_pause]
        assert len(pauses) == 1
        assert abs((pauses[0].end - pauses[0].start) - 0.01) < 1e-9

    def test_construct_syntagmes(self):
        rows = bdd.align_rows(
            make_rows(["un", "deux", "", "trois"]), make_rows(["un", "deux", "", "trois"])
        )
        synts = bdd.construct_syntagmes(rows)
        assert [s.syntagme for s in synts] == ["un deux", "", "trois"]
        assert synts[1].is_pause and synts[1].pause_natural > 0


class TestPitchStage:
    def test_geometric_mean_pitch(self, tmp_path):
        t = np.arange(SR) / SR
        x = 0.5 * np.sin(2 * np.pi * 220 * t)
        wav = tmp_path / "segment_ph1.wav"
        wavio.write_wav(wav, x, SR)
        nat = make_rows(["salut"], wav=str(wav), word_dur=0.9)
        rows = bdd.align_rows(nat, make_rows(["salut"], wav=str(wav), word_dur=0.9))
        synts = bdd.construct_syntagmes(rows)
        bdd.compute_pitch_adjustments(synts)
        assert abs(synts[0].natural_pitch - 220) / 220 < 2e-3
        # identical natural/synth ⇒ no adjustment
        assert abs(synts[0].pitch_adjustment) < 1e-6
        assert abs(synts[0].relative_pitch_pct) < 1e-6

    def test_low_pitch_uses_lower_floor(self, tmp_path):
        # 90 Hz < the 150 floor but ≥ the 75 retry floor
        t = np.arange(SR) / SR
        x = 0.5 * np.sin(2 * np.pi * 90 * t) + 0.2 * np.sin(2 * np.pi * 180 * t)
        wav = tmp_path / "segment_ph1.wav"
        wavio.write_wav(wav, x, SR)
        p = bdd._PitchCache().geometric_mean_pitch(str(wav), 0.1, 0.9)
        assert abs(p - 90) / 90 < 0.02


class TestLoudnessRate:
    def test_loudness_clip(self, tmp_path):
        t = np.arange(SR) / SR
        loud = 0.5 * np.sin(2 * np.pi * 200 * t)
        quiet = 0.005 * np.sin(2 * np.pi * 200 * t)
        wn, ws = tmp_path / "n.wav", tmp_path / "s.wav"
        wavio.write_wav(wn, loud, SR)
        wavio.write_wav(ws, quiet, SR)
        nat = make_rows(["mot"], wav=str(wn), word_dur=0.9)
        syn = make_rows(["mot"], wav=str(ws), word_dur=0.9)
        synts = bdd.construct_syntagmes(bdd.align_rows(nat, syn))
        bdd.compute_loudness_adjustments(synts)
        assert synts[0].natural_loudness > synts[0].synthesized_loudness
        assert -20 <= synts[0].loudness_adjustment <= 20

    def test_rate_words_per_minute(self):
        nat = make_rows(["un", "deux", "trois"], word_dur=0.2)
        syn = make_rows(["un", "deux", "trois"], word_dur=0.4)
        synts = bdd.construct_syntagmes(bdd.align_rows(nat, syn))
        bdd.compute_rate_adjustments(synts)
        s = synts[0]
        assert s.word_count == 3
        # natural is twice as fast → +100 % clipped at 100
        assert abs(s.rate_adjustment - 100.0) < 1e-6


class TestSSMLFragments:
    def test_power_law_and_pause_clamp(self):
        frag = bdd.ssml_fragment("bonjour", pitch_adj=16.0, rate_adj=32.0, loudness_adj=5.0, pause_natural_s=0.0)
        assert "pitch='+4.00%'" in frag  # 16^0.5
        assert "rate='+2.00%'" in frag  # min(2, 32^0.8=16.0→2)
        pause = bdd.ssml_fragment("", 0, 0, 0, pause_natural_s=6.0)
        assert pause == "<break time='500ms'/>"  # 6000/3=2000→clamp 500
        tiny = bdd.ssml_fragment("", 0, 0, 0, pause_natural_s=0.0015)
        assert tiny == "<break time='1ms'/>"  # 1.5/3=0.5→clamp 1

    def test_breath_hint(self):
        frag = bdd.ssml_fragment("vraiment!", 0, 0, 0, 0)
        assert "vraiment! h" in frag

    def test_segment_assembly(self):
        nat = make_rows(["un", "", "deux."], wav="x/segment_ph3.wav")
        synts = bdd.construct_syntagmes(bdd.align_rows(nat, nat))
        rows = bdd.build_ssml_fragments(synts, "fr-FR-HenriNeural")
        assert rows[0]["segment"] == 3
        assert rows[0]["ssml"].startswith("<speak version='1.0'")
        assert "<break time=" in rows[0]["ssml"]


class TestVoc:
    def test_full_chain_with_checkpoints(self, tmp_path):
        gen = FakeBackend(seed=5)
        vdir = tmp_path / "nat"
        sdir = tmp_path / "syn"
        for d, seed in ((vdir, 1), (sdir, 2)):
            (d / "audio").mkdir(parents=True)
            (d / "WhisperTS_textgrid_files").mkdir(parents=True)
        words = ["bonjour", "tout", "le", "monde."]
        times = []
        t = 0.0
        chunks = []
        for w in words:
            a = gen._voice(w, 0, 0, 0)
            times.append((t, t + len(a) / SR, w))
            t += len(a) / SR
            chunks.append(a)
        x = np.concatenate(chunks)
        for d in (vdir, sdir):
            wavio.write_wav(d / "audio" / "segment_ph1.wav", x, SR)
            tg = word_tier_with_silences(times, len(x) / SR)
            write_textgrid(tg, d / "WhisperTS_textgrid_files" / "segment_ph1.TextGrid")

        out = tmp_path / "out"
        voc = Voc(vdir, sdir, out, tts=FakeBackend(seed=9))
        result = voc.run_pipeline()
        assert result.exists()
        assert (out / "BDD_ssml.csv").exists()
        assert (out / "BDD4.csv").exists()
        assert (out / "checkpoint_tts_merge_done.txt").exists()
        # resume: second run skips (checkpoint)
        calls_before = None
        tts2 = FakeBackend(seed=9)
        voc2 = Voc(vdir, sdir, out, tts=tts2)
        voc2.run_pipeline()
        assert tts2.calls == 0  # skipped via checkpoint


class TestAudioMerge:
    def test_numeric_order_and_skip(self, tmp_path):
        from prosody_control_french_tts_tpu.audio.merge import merge_wav_from_folder

        for i, val in ((1, 0.1), (2, 0.2), (10, 0.3)):
            wavio.write_wav(tmp_path / f"segment_ph{i}.wav", np.full(100, val), 8000)
        (tmp_path / "segment_ph3.wav").write_bytes(b"not a wav")
        out = tmp_path / "merged.wav"
        assert merge_wav_from_folder(tmp_path, out, pattern="segment_ph*.wav")
        a = wavio.read_wav(out)
        assert a.samples.shape[0] == 300
        # numeric order: ph2 before ph10
        assert abs(a.samples[150] - 0.2) < 1e-3
        assert abs(a.samples[250] - 0.3) < 1e-3
