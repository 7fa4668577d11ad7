"""Golden tests for the measure stage.

1. An independent numpy oracle re-implements the reference's adjustment
   chain (Code/audioPipeline.py:524-602) from the same measured inputs and
   must agree with prosody.adjust to float tolerance.
2. The round-trip product claim: measuring a 'natural' voice whose pitch
   sits above the raw synthesis and re-synthesizing with the emitted SSML
   must move the output's F0 toward the natural voice.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from prosody_control_french_tts_tpu.prosody.adjust import (
    ProsodySettings,
    ema_smooth,
    jump_limit,
    pitch_adjust_pct,
    rate_adjust_pct,
    segment_baselines,
    smooth_series,
    volume_adjust_pct,
)


class TestAdjustmentOracle:
    """Vectorised jnp math vs a literal scalar transcription of the
    reference formulas."""

    def _oracle_pitch(self, p_nat, f0_base, P_ST, factor):
        if p_nat <= 0:
            return 0.0
        st = 12 * np.log2(p_nat / f0_base)
        st = np.clip(st, -P_ST * factor, P_ST)
        return (2 ** (st / 12) - 1) * 100

    def _oracle_volume(self, loud_base, l_syn, V_PCT):
        v = (10 ** ((loud_base - l_syn) / 20) - 1.0) * 100.0
        return float(np.clip(v, -V_PCT, V_PCT))

    def _oracle_rate(self, wc, d_nat, d_syn, s: ProsodySettings):
        if wc > 0:
            nat_r, syn_r = wc / d_nat, wc / d_syn
            rp = (nat_r - syn_r) / syn_r * 100
        else:
            rp = 0.0
        length_s = d_nat
        if length_s <= 1.0:
            slow, fast = 1.0, 1.0
        else:
            slow, fast = length_s**1.5, np.sqrt(length_s)
        rp = rp * slow if rp < 0 else rp / fast
        rp -= max(0.0, length_s - s.threshold_duration_before_slowing_down) * s.slow_floor_per_sec
        if length_s > 5.0:
            return float(np.clip(rp, -s.rate_percent * 1.5, s.rate_percent * 0.5))
        return float(np.clip(rp, -s.rate_percent, s.rate_percent))

    def test_vectorised_matches_scalar_oracle(self, rng):
        s = ProsodySettings(pitch_semitones=1.3, volume_pct=10.0, rate_percent=10.0)
        n = 300
        p_nat = np.where(rng.random(n) < 0.2, 0.0, rng.uniform(80, 400, n))
        f0_base = rng.uniform(120, 250, n)
        loud_base = rng.uniform(-30, -10, n)
        l_syn = rng.uniform(-35, -8, n)
        wc = rng.integers(0, 12, n)
        d_nat = rng.uniform(0.05, 8.0, n)
        d_syn = rng.uniform(0.05, 8.0, n)

        got_p = np.asarray(pitch_adjust_pct(jnp.asarray(p_nat, jnp.float32), jnp.asarray(f0_base, jnp.float32), s.pitch_semitones, s.pitch_lower_clip_factor))
        got_v = np.asarray(volume_adjust_pct(jnp.asarray(loud_base, jnp.float32), jnp.asarray(l_syn, jnp.float32), s.volume_pct))
        got_r = np.asarray(rate_adjust_pct(jnp.asarray(wc, jnp.float32), jnp.asarray(d_nat, jnp.float32), jnp.asarray(d_syn, jnp.float32), s))
        for i in range(n):
            assert abs(got_p[i] - self._oracle_pitch(p_nat[i], f0_base[i], s.pitch_semitones, s.pitch_lower_clip_factor)) < 1e-3
            assert abs(got_v[i] - self._oracle_volume(loud_base[i], l_syn[i], s.volume_pct)) < 1e-3
            assert abs(got_r[i] - self._oracle_rate(wc[i], d_nat[i], d_syn[i], s)) < 1e-2

    def test_smoothing_matches_reference_loops(self, rng):
        """EMA then in-place jump limiting — the exact two sequential loops
        of Code/audioPipeline.py:593-602."""
        x = rng.normal(size=60).astype(np.float32) * 10
        alpha, max_jump = 0.2, 8.0
        sm = [x[0]]
        for i in range(1, len(x)):
            sm.append(alpha * x[i] + (1 - alpha) * sm[-1])
        for i in range(1, len(sm)):
            if abs(sm[i] - sm[i - 1]) > max_jump:
                sm[i] = sm[i - 1] + np.sign(sm[i] - sm[i - 1]) * max_jump
        got = np.asarray(smooth_series(x, alpha, max_jump))
        np.testing.assert_allclose(got, sm, rtol=1e-5, atol=1e-5)

    def test_baselines_window_semantics(self):
        """Centred window, zero-pitch exclusion, `or 1.0` fallback
        (Code/audioPipeline.py:401-424)."""
        p = np.array([100.0, 0.0, 120.0, 140.0, 0.0, 160.0])
        l = np.arange(6, dtype=float)
        r = np.ones(6)
        b = segment_baselines(p, l, r, window=3)
        # i=1: window [0,3): pitches 100,0,120 → median of [100,120]=110
        assert b["f0"][1] == 110.0
        # i=4: window [3,6): [140,0,160] → median [140,160]=150
        assert b["f0"][4] == 150.0
        # all-zero window → 1.0 fallback
        b2 = segment_baselines(np.zeros(3), l[:3], r[:3], window=None)
        assert b2["f0"][0] == 1.0


class TestRoundTripQuality:
    def test_ssml_reproduces_natural_pitch_dynamics(self, tmp_path):
        """The product claim: the SSML makes the synthetic voice follow the
        natural voice's prosodic *dynamics*. (A constant cross-voice pitch
        offset is by design NOT corrected — the pitch baseline is the
        natural voice's own windowed median, Code/audioPipeline.py:524-530.)

        Natural voice: first syntagme at +10 % pitch, second at −6 % with a
        pause between. Expect: positive pitch% on the first, negative on
        the second, and OUT.wav's first/second-half F0 ratio tracking the
        natural contour while the raw synthesis is flat."""
        from prosody_control_french_tts_tpu.core.config import PipelineConfig
        from prosody_control_french_tts_tpu.core.pipeline import AudioPipeline
        from prosody_control_french_tts_tpu.ops.pitch import PitchParams, praat_pitch
        from prosody_control_french_tts_tpu.tts.fake import FakeBackend
        from prosody_control_french_tts_tpu.utils import wavio
        from prosody_control_french_tts_tpu.utils.textgridio import word_tier_with_silences, write_textgrid

        SR = 44100
        name = "rt"
        vdir = tmp_path / "Data" / "voice" / name
        (vdir / "audio").mkdir(parents=True)
        (vdir / "transcription_raw").mkdir(parents=True)
        tgd = vdir / "WhisperTS_textgrid_files"
        tgd.mkdir()
        gen = FakeBackend(seed=3)
        part_a = ["bonjour", "tout", "cher", "monde"]
        part_b = ["voici", "notre", "grande", "histoire."]
        chunks, times, t = [], [], 0.0
        for w in part_a:
            a = gen._voice(w, pitch_pct=10.0, rate_pct=0.0, volume_pct=0.0)
            times.append((t, t + len(a) / SR, w))
            t += len(a) / SR
            chunks.append(a)
        chunks.append(np.zeros(int(0.4 * SR)))  # pause → syntagme boundary
        t += 0.4
        for w in part_b:
            a = gen._voice(w, pitch_pct=-6.0, rate_pct=0.0, volume_pct=0.0)
            times.append((t, t + len(a) / SR, w))
            t += len(a) / SR
            chunks.append(a)
        x = np.concatenate(chunks)
        wavio.write_wav(vdir / "audio" / "segment_ph1.wav", x, SR)
        write_textgrid(word_tier_with_silences(times, len(x) / SR), tgd / "segment_ph1.TextGrid")
        (vdir / "transcription_raw" / "segment_ph1.txt").write_text(
            " ".join(part_a + part_b)
        )

        cfg = PipelineConfig.from_dict(
            {
                "data_dir": "Data/voice",
                "out_dir": "Out",
                "voice_names": [name],
                "tts_backend": "fake",
                "aligner": "precomputed",
                # no smoothing so the per-syntagme signs are crisp
                "prosody_settings": {
                    "pitch_semitones": 2.5,
                    "baseline_window": 10,
                    "smoothing_alpha": 1.0,
                    "max_jump_percent": 100,
                },
            },
            tmp_path,
        )
        pipe = AudioPipeline(name, cfg, tts=FakeBackend(seed=9))
        pipe.raw_synthesis()
        pipe.measure_prosody_and_build_ssml()
        pipe.synthesize_and_merge()

        text_rows = [r for r in pipe.last_measure.rows if r.syntagme]
        assert len(text_rows) == 2
        # dynamics: first syntagme above baseline, second below
        assert text_rows[0].raw_pitch > 1.0, text_rows
        assert text_rows[1].raw_pitch < -1.0, text_rows

        def half_f0(path):
            a = wavio.read_wav(path).to_mono()
            s = np.asarray(a.samples, np.float32)
            h = len(s) // 2
            out = []
            for seg in (s[:h], s[h:]):
                tr = praat_pitch(seg, a.rate, PitchParams())
                f0 = np.asarray(tr.f0)
                out.append(float(np.median(f0[f0 > 0])))
            return out

        nat_a, nat_b = half_f0(vdir / "audio" / "segment_ph1.wav")
        out_a, out_b = half_f0(tmp_path / "Out" / "results" / name / "OUT.wav")
        assert nat_a > nat_b  # the natural contour falls
        assert out_a > out_b, (out_a, out_b)  # and OUT follows it


class TestCompactTransfer:
    """prosody.measure._audio_to_device — the compact h2d path must be
    bit-identical to a plain padded device_put (rows re-expanded on device
    from the packed stream)."""

    def test_bit_parity_and_fallbacks(self):
        from prosody_control_french_tts_tpu.prosody.measure import _audio_to_device

        rng = np.random.default_rng(0)
        for dtype in (np.int16, np.float32):
            S, T = 7, 40000
            lens = rng.integers(0, T, S)
            lens[0] = T  # a full row
            lens[1] = 0  # an empty row (missing raw file)
            a = np.zeros((S, T), dtype)
            for i in range(S):
                a[i, : lens[i]] = (rng.standard_normal(lens[i]) * 1000).astype(dtype)
            out = np.asarray(_audio_to_device(a, lens))
            assert out.dtype == a.dtype and out.shape == a.shape
            assert (out == a).all()
            # low padding → the plain device_put path, same contents
            out2 = np.asarray(_audio_to_device(a, np.full(S, T)))
            assert (out2 == a).all()
        # malformed lens (out of range) must fall back, not corrupt
        bad = np.asarray(_audio_to_device(a, np.full(S, T + 1)))
        assert (bad == a).all()
