"""Learned vocal isolation (audio/separate.py) — the Demucs-role member
of the denoiser family (Code/Preprocessing/demucs_process.py)."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from prosody_control_french_tts_tpu.align.synth_speech import SynthSpec, synth_sentence
from prosody_control_french_tts_tpu.audio.separate import (
    PACKAGED_WEIGHTS,
    MaskSeparator,
    si_snr_db,
    synth_music,
)
from prosody_control_french_tts_tpu.ops.stft import istft_overlap_add, stft
from prosody_control_french_tts_tpu.utils.wavio import Audio


class TestISTFT:
    def test_roundtrip(self, rng):
        x = rng.normal(size=30000).astype(np.float32) * 0.3
        spec = stft(jnp.asarray(x), n_fft=1024, hop_length=256, center=True)
        y = np.asarray(istft_overlap_add(spec, 1024, 256, x.size))
        # edges lose window support; interior must reconstruct exactly
        assert np.max(np.abs(y[1024:-1024] - x[1024:-1024])) < 1e-4


class TestMusicBed:
    def test_deterministic_and_bounded(self):
        a = synth_music(2.0, 16000, seed=3)
        b = synth_music(2.0, 16000, seed=3)
        np.testing.assert_array_equal(a, b)
        assert np.max(np.abs(a)) <= 0.5 + 1e-6
        assert a.shape == (32000,)


@pytest.mark.skipif(not PACKAGED_WEIGHTS.exists(), reason="packaged MaskNet not built")
class TestPackagedSeparator:
    def test_si_snr_gain_on_heldout_mixtures(self):
        from prosody_control_french_tts_tpu.align.synth_speech import sample_sentences

        sep = MaskSeparator()  # zero config — auto-loads the checkpoint
        assert sep.params is not None
        spec = SynthSpec(sample_rate=16000)
        gains = []
        for i, sent in enumerate(sample_sentences(4, seed=909_000)):
            speech, _ = synth_sentence(sent, spec, seed=909_000 + i)
            music = synth_music(speech.size / 16000 + 0.1, 16000, seed=77_000 + i)[: speech.size]
            g = 10.0 ** (-6.0 / 20.0) * (np.std(speech) + 1e-9) / (np.std(music) + 1e-9)
            mix = speech + g * music
            est = np.asarray(sep.separate(Audio(mix, 16000)).samples, np.float32)
            n = min(est.size, speech.size)
            gains.append(si_snr_db(est[:n], speech[:n]) - si_snr_db(mix[:n], speech[:n]))
        assert float(np.mean(gains)) > 3.0, gains

    def test_native_rate_input_resampled(self):
        """44.1 kHz input (the usual brute-recording rate) must be
        processed at the checkpoint's 16 kHz training rate and returned at
        the input rate — a mask trained on 16 kHz bins applied directly to
        44.1 kHz spectra would attenuate the wrong bands."""
        from prosody_control_french_tts_tpu.utils.wavio import resample

        sep = MaskSeparator()
        spec = SynthSpec(sample_rate=16000)
        speech, _ = synth_sentence("la radio du matin", spec, seed=31)
        music = synth_music(speech.size / 16000 + 0.1, 16000, seed=32)[: speech.size]
        mix16 = Audio(speech + 0.4 * music, 16000)
        mix44 = resample(mix16, 44100)
        est = sep.separate(mix44)
        assert est.rate == 44100
        assert abs(est.samples.shape[-1] - mix44.samples.shape[-1]) <= 4
        est16 = np.asarray(resample(est, 16000).samples, np.float32)
        n = min(est16.size, speech.size)
        gain = si_snr_db(est16[:n], speech[:n]) - si_snr_db(
            np.asarray(mix16.samples, np.float32)[:n], speech[:n]
        )
        assert gain > 2.0, gain

    def test_pipeline_denoise_mask(self, tmp_path):
        """`denoise: mask` cleans the brute recording before the silence
        split — the reference's demucs_process position in the chain."""
        from prosody_control_french_tts_tpu.core.config import PipelineConfig
        from prosody_control_french_tts_tpu.core.pipeline import AudioPipeline
        from prosody_control_french_tts_tpu.tts.fake import FakeBackend
        from prosody_control_french_tts_tpu.utils import wavio

        spec = SynthSpec(sample_rate=16000)
        s1, _ = synth_sentence("la musique commence demain", spec, seed=1)
        s2, _ = synth_sentence("le concert du soir", spec, seed=2)
        gap = np.zeros(int(1.5 * 16000), np.float32)
        speech = np.concatenate([s1, gap, s2])
        music = synth_music(speech.size / 16000 + 0.1, 16000, seed=5)[: speech.size]
        brute = speech + 0.3 * music

        vdir = tmp_path / "Data" / "voice" / "mv"
        (vdir / "brute").mkdir(parents=True)
        wavio.write_wav(vdir / "brute" / "segment.wav", brute, 16000)
        cfg = PipelineConfig.from_dict(
            {
                "data_dir": "Data/voice",
                "out_dir": "Out",
                "voice_names": ["mv"],
                "tts_backend": "fake",
                "denoise": "mask",
                "silence": {"min_silence_len": 1000, "silence_thresh": -35, "keep_silence": 300},
            },
            tmp_path,
        )
        pipe = AudioPipeline("mv", cfg, tts=FakeBackend(seed=1))
        pipe.preprocess()
        segs = sorted((vdir / "audio").glob("*.wav"))
        assert len(segs) == 2, [s.name for s in segs]
        # the denoised intermediate must be quieter in the gap than the mix
        den = wavio.read_wav(vdir / "brute" / "segment_denoised.wav").to_mono()
        d = np.asarray(den.samples, np.float32)
        gap_sl = slice(s1.size + 4000, s1.size + gap.size - 4000)
        assert np.std(d[gap_sl]) < np.std(brute[gap_sl]) * 0.7
