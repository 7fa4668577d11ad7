"""Independent YIN pitch oracle (eval/yin.py): correctness on analytic
signals + cross-method agreement with the production Boersma kernel on the
bundled real corpus — the round-4 review item: voice evaluation must not
grade the pipeline's own kernel with itself."""

import numpy as np
import pytest

from prosody_control_french_tts_tpu.eval.yin import cross_method_agreement, yin_f0


SR = 44100


def _tone(f0: float, dur: float = 1.0, sr: int = SR, harmonics: int = 4) -> np.ndarray:
    t = np.arange(int(dur * sr)) / sr
    x = np.zeros_like(t, dtype=np.float32)
    for h in range(1, harmonics + 1):
        x += (0.5 / h) * np.sin(2 * np.pi * f0 * h * t).astype(np.float32)
    return x


class TestYinAnalytic:
    @pytest.mark.parametrize("f0", [80.0, 120.0, 220.0, 440.0])
    def test_steady_tone(self, f0):
        f, _ = yin_f0(_tone(f0), SR)
        voiced = f[f > 0]
        assert voiced.size > 0.9 * f.size
        err_cents = 1200 * np.abs(np.log2(voiced / f0))
        assert np.median(err_cents) < 10, (f0, np.median(err_cents))

    def test_vibrato_tracks(self):
        t = np.arange(int(1.5 * SR)) / SR
        inst = 150.0 * (1 + 0.05 * np.sin(2 * np.pi * 5.0 * t))  # ±5 % at 5 Hz
        phase = 2 * np.pi * np.cumsum(inst, dtype=np.float64) / SR
        x = np.sin(phase).astype(np.float32) + 0.3 * np.sin(2 * phase).astype(np.float32)
        f, times = yin_f0(x, SR)
        v = f > 0
        assert v.mean() > 0.9
        # instantaneous truth at frame centres
        truth = 150.0 * (1 + 0.05 * np.sin(2 * np.pi * 5.0 * times[v]))
        err_cents = 1200 * np.abs(np.log2(f[v] / truth))
        assert np.median(err_cents) < 25

    def test_noise_is_unvoiced(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(SR).astype(np.float32)
        f, _ = yin_f0(x, SR)
        assert (f > 0).mean() < 0.3

    def test_silence_is_unvoiced(self):
        f, _ = yin_f0(np.zeros(SR, np.float32), SR)
        assert (f > 0).mean() < 0.1

    def test_octave_safety_missing_fundamental(self):
        """Harmonics 2..5 of 110 Hz with no fundamental: the period is still
        1/110 — YIN must recover the fundamental, not the strongest
        harmonic."""
        t = np.arange(SR) / SR
        x = sum(
            (0.4 / h) * np.sin(2 * np.pi * 110.0 * h * t) for h in range(2, 6)
        ).astype(np.float32)
        f, _ = yin_f0(x, SR)
        v = f[f > 0]
        assert v.size > 0.8 * f.size
        err_cents = 1200 * np.abs(np.log2(np.median(v) / 110.0))
        assert err_cents < 30


class TestCrossMethodAgreement:
    """YIN vs the production Boersma kernel on real speech. These pins are
    the regression gate for the ROADMAP agreement table — two independent
    estimators agreeing within tens of cents on commonly-voiced frames is
    the evidence the reference got from torchcrepe."""

    @pytest.fixture(scope="class")
    def tracks(self, corpus_wavs):
        from prosody_control_french_tts_tpu.eval.metrics import f0_contour
        from prosody_control_french_tts_tpu.ops.pitch import PitchParams, praat_pitch
        from prosody_control_french_tts_tpu.utils.wavio import read_wav

        out = []
        for w in corpus_wavs[:3]:
            a = read_wav(w).to_mono()
            x = np.asarray(a.samples, np.float32)
            yf, yt = yin_f0(x, a.rate, fmin=60.0, fmax=600.0)
            tr = praat_pitch(x, a.rate, PitchParams(floor=60.0, ceiling=600.0))
            bf = np.asarray(tr.f0)
            out.append((yf, yt, bf, np.asarray(tr.times)))
        return out

    def test_agreement_on_real_speech(self, tracks):
        stats = [cross_method_agreement(yf, yt, bf, bt) for yf, yt, bf, bt in tracks]
        med = np.median([s["median_abs_cents"] for s in stats])
        voicing = np.median([s["voicing_agreement"] for s in stats])
        gross = np.median([s["gross_error_rate"] for s in stats])
        # regression pins (recorded in ROADMAP's agreement table; measured
        # ph2/3/4: median 6.1-7.7 cents, voicing 0.69-0.75, gross 3-6 %)
        assert med < 25.0, stats
        assert voicing > 0.60, stats
        assert gross < 0.12, stats

    def test_eval_contour_uses_yin(self, corpus_wavs):
        from prosody_control_french_tts_tpu.eval.metrics import f0_contour
        from prosody_control_french_tts_tpu.utils.wavio import read_wav

        a = read_wav(corpus_wavs[0]).to_mono()
        x = np.asarray(a.samples, np.float32)
        yin = f0_contour(x, a.rate)
        boe = f0_contour(x, a.rate, method="boersma")
        # different estimators: frame grids differ, both track the voice
        assert (yin > 0).any() and (boe > 0).any()
        assert yin.shape != boe.shape or not np.allclose(yin, boe)
