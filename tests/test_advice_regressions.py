"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. native batch ingest must size strides in *output* (resampled) samples —
   upsampled audio was silently truncated;
2. a syntagme window past the raw file's end uses the reference's
   get_part_duration empty-slice epsilon (1e-4 s), not the full raw-file
   duration (Code/audioPipeline.py:314-323);
3. multi-WordPiece words must stay merged in the aligner's TextGrid;
4. mixed-rate corpora are resampled to one common rate at ingest, and
   batched measure never groups voices of different rates together.
"""

import numpy as np
import pytest

from prosody_control_french_tts_tpu.prosody.adjust import ProsodySettings
from prosody_control_french_tts_tpu.prosody.measure import (
    _load_padded,
    postprocess_voice,
    prepare_voice,
)
from prosody_control_french_tts_tpu.utils import native_audio, wavio
from prosody_control_french_tts_tpu.utils.textgridio import (
    word_tier_with_silences,
    write_textgrid,
)


@pytest.fixture(scope="module")
def native():
    if not native_audio.ensure_built():
        pytest.skip("native toolchain unavailable")
    return native_audio


def _tone(seconds, rate, freq=220.0, amp=0.3):
    t = np.arange(int(seconds * rate)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestUpsampledIngest:
    def test_native_ingest_keeps_full_upsampled_length(self, native, tmp_path):
        """4 s at 24 kHz ingested with a 44.1 kHz target must yield the full
        4 s worth of output samples (was: clipped to the header-sized
        stride, ~2.79 s)."""
        p = tmp_path / "low.wav"
        wavio.write_wav(p, _tone(4.0, 24000), 24000)
        batch, lens, rate, ok = _load_padded([p], rate_expect=44100)
        assert rate == 44100 and ok[0]
        expect = int(4.0 * 24000 * 44100 / 24000)  # C resampler: floor(n·ratio)
        assert abs(int(lens[0]) - expect) <= 2, (int(lens[0]), expect)
        # and it matches the pure-Python ingest path (scipy resample)
        a = wavio.read_wav(p).to_mono()
        from prosody_control_french_tts_tpu.utils.wavio import resample

        py_len = resample(a, 44100).samples.shape[0]
        assert abs(int(lens[0]) - py_len) <= 2

    def test_mixed_rate_corpus_unified(self, native, tmp_path):
        """Without an explicit target rate, a mixed-rate corpus resamples to
        the first file's rate instead of silently mixing rates."""
        p1 = tmp_path / "a.wav"
        p2 = tmp_path / "b.wav"
        wavio.write_wav(p1, _tone(1.0, 44100), 44100)
        wavio.write_wav(p2, _tone(1.0, 22050), 22050)
        batch, lens, rate, ok = _load_padded([p1, p2])
        assert rate == 44100
        assert abs(int(lens[0]) - 44100) <= 2
        assert abs(int(lens[1]) - 44100) <= 2  # 22050 frames upsampled ×2


class TestEmptyRawSliceDuration:
    def test_window_past_raw_end_uses_epsilon_duration(self, tmp_path):
        """Natural 2 s with its only syntagme at [1.0, 1.5] s; raw synthesis
        decoded fine but is only 0.5 s long. The reference measures the raw
        slice duration as 1e-4 (empty slice) → maximal slowdown; the bug
        reused the full raw-file duration (0.5 s) which can flip the sign."""
        rate = 16000
        tg_dir = tmp_path / "tg"
        raw_dir = tmp_path / "raw"
        tg_dir.mkdir()
        raw_dir.mkdir()
        nat_p = tmp_path / "segment_ph1.wav"
        wavio.write_wav(nat_p, _tone(2.0, rate), rate)
        wavio.write_wav(raw_dir / "segment_ph1.wav", _tone(0.5, rate), rate)
        write_textgrid(
            word_tier_with_silences([(1.0, 1.5, "bonjour")], 2.0),
            tg_dir / "segment_ph1.TextGrid",
        )
        s = ProsodySettings(rate_percent=10.0)
        prep = prepare_voice([nat_p], tg_dir, raw_dir, s)
        assert prep.raw_ok[0]
        j = next(j for j, syn in enumerate(prep.synts_per_seg[0]) if syn.words)
        assert prep.raw_slice_empty[0, j]

        # synthetic device outputs: postprocess only needs shapes/values
        S, N = prep.mask.shape
        outs = (
            np.full((S, N), 200.0, np.float32),  # p_syn
            np.full(S, 200.0, np.float32),  # p_seg
            np.full((S, N), -20.0, np.float32),  # l_nat_syn
            np.full(S, -20.0, np.float32),  # l_nat_seg
            np.full((S, N), -20.0, np.float32),  # l_raw_syn
            np.full(S, -20.0, np.float32),  # l_raw_seg
        )
        res = postprocess_voice(prep, outs, s)
        rows = [r for r in res.rows if r.syntagme]
        assert len(rows) == 1
        # d_syn = 1e-4 → syn rate enormous → max slowdown at the clamp
        assert rows[0].raw_rate == pytest.approx(-s.rate_percent, abs=1e-3)

    def test_missing_raw_file_still_uses_natural_slice(self, tmp_path):
        """The win_nat substitution for entirely missing raw files is
        unchanged: d_syn == d_nat → zero rate adjustment."""
        rate = 16000
        tg_dir = tmp_path / "tg"
        raw_dir = tmp_path / "raw"  # left empty: raw file missing
        tg_dir.mkdir()
        raw_dir.mkdir()
        nat_p = tmp_path / "segment_ph1.wav"
        wavio.write_wav(nat_p, _tone(2.0, rate), rate)
        write_textgrid(
            word_tier_with_silences([(1.0, 1.5, "bonjour")], 2.0),
            tg_dir / "segment_ph1.TextGrid",
        )
        s = ProsodySettings(rate_percent=10.0)
        prep = prepare_voice([nat_p], tg_dir, raw_dir, s)
        assert not prep.raw_ok[0]
        S, N = prep.mask.shape
        outs = (
            np.full((S, N), 200.0, np.float32),
            np.full(S, 200.0, np.float32),
            np.full((S, N), -20.0, np.float32),
            np.full(S, -20.0, np.float32),
            np.full((S, N), -20.0, np.float32),
            np.full(S, -20.0, np.float32),
        )
        res = postprocess_voice(prep, outs, s)
        rows = [r for r in res.rows if r.syntagme]
        assert rows[0].raw_rate == pytest.approx(0.0, abs=1e-3)


class TestSubwordWordGrouping:
    def test_multipiece_words_stay_merged(self, monkeypatch):
        """A word that tokenizes to several WordPieces must come out of
        align() as ONE TextGrid word (decode([t]) strips '##', which made
        every continuation piece look like a word start)."""
        import jax
        import jax.numpy as jnp

        from prosody_control_french_tts_tpu.align.whisper_jax import (
            WhisperAligner,
            WhisperConfig,
        )
        from prosody_control_french_tts_tpu.models.tokenizer import WordPieceTokenizer

        text = "extraordinairement bon"
        tok = WordPieceTokenizer.train([text], vocab_size=26, min_freq=1)
        assert len(tok.word_to_pieces("extraordinairement")) > 1  # really splits

        cfg = WhisperConfig.test()
        al = WhisperAligner(cfg)
        al.tokenizer = tok
        al.params = al.model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 40, cfg.n_mels)),
            jnp.asarray([[1, 2]], jnp.int32),
        )

        # deterministic monotonic token spans (the random-init model's
        # attention is noise; this test is about *grouping*, not timing)
        import prosody_control_french_tts_tpu.align.whisper_jax as WJ

        def fake_spans(cross, n_frames, frame_dt=0.02):
            n_tok = cross[0].shape[-2]
            return np.array([[0.05 * i, 0.05 * (i + 1)] for i in range(n_tok)])

        monkeypatch.setattr(WJ, "token_times_from_cross_attention", fake_spans)
        audio = wavio.Audio(_tone(1.0, 16000), 16000)
        tg = al.align(audio, text)
        marks = [iv.mark for iv in tg.tiers[0] if iv.mark.strip()]
        assert marks == text.split()


class TestMixedRateBatching:
    def test_batched_measure_groups_by_rate(self, tmp_path):
        """Two voices with equal padded lengths but different sample rates
        must land in different dispatch groups (one rate per program)."""
        from prosody_control_french_tts_tpu.prosody import measure as M

        settings = ProsodySettings()
        preps = {}
        for name, rate in (("v44", 44100), ("v16", 16000)):
            tg_dir = tmp_path / name / "tg"
            raw_dir = tmp_path / name / "raw"
            tg_dir.mkdir(parents=True)
            raw_dir.mkdir()
            nat_p = tmp_path / name / "segment_ph1.wav"
            wavio.write_wav(nat_p, _tone(0.5, rate), rate)
            wavio.write_wav(raw_dir / "segment_ph1.wav", _tone(0.5, rate), rate)
            write_textgrid(
                word_tier_with_silences([(0.05, 0.45, "bonjour")], 0.5),
                tg_dir / "segment_ph1.TextGrid",
            )
            preps[name] = prepare_voice([nat_p], tg_dir, raw_dir, settings)
        assert preps["v44"].rate != preps["v16"].rate
        assert preps["v44"].nat.shape[1] == preps["v16"].nat.shape[1]  # same bucket T

        # the two rates must reach the (fused multi-group) device dispatch
        # as SEPARATE groups with their own static rates
        calls = []
        orig = M._dispatch_groups_fused

        def spy(group_items, pp):
            calls.append([float(items[0][1].rate) for items in group_items])
            return orig(group_items, pp)

        M._dispatch_groups_fused, saved = spy, orig
        try:
            res = M.measure_voices_batched(preps, settings)
        finally:
            M._dispatch_groups_fused = saved
        assert calls and sorted(calls[0]) == [16000.0, 44100.0]
        assert set(res) == {"v16", "v44"}
