"""Contracts of the narrator-domain formant synthesizer (VERDICT r4 #1).

The generator must (a) honour the synth_speech.synth_sentence interface the
pretraining stack consumes (gold word + per-char spans over the exact
sentence text), (b) land in the measured narrator domain (F0 register,
level), and (c) stay deterministic per seed.
"""

import numpy as np
import pytest

from prosody_control_french_tts_tpu.align.formant_speech import (
    PHONES,
    FormantSpec,
    synth_sentence,
)
from prosody_control_french_tts_tpu.align.g2p_fr import PHONES as G2P_PHONES
from prosody_control_french_tts_tpu.align.synth_speech import sample_sentences


class TestInterface:
    def test_char_spans_cover_sentence(self):
        for i, s in enumerate(sample_sentences(6, seed=42)):
            x, words, chars = synth_sentence(s, seed=100 + i, with_chars=True)
            assert len(chars) == len(s), s
            assert all(c == ch for (_, _, c), ch in zip(chars, s)), s
            starts = [c[0] for c in chars]
            assert all(b >= a - 1e-6 for a, b in zip(starts, starts[1:])), s

    def test_word_spans_monotone_and_inside_audio(self):
        x, words = synth_sentence("bonjour et bienvenue dans cette émission", seed=3)
        dur = len(x) / 16000
        assert [w for _, _, w in words] == "bonjour et bienvenue dans cette émission".split()
        for (a0, a1, _), (b0, b1, _) in zip(words, words[1:]):
            assert a0 < a1 <= b0 < b1
        assert words[-1][1] <= dur + 1e-6

    def test_deterministic_per_seed(self):
        a1, w1 = synth_sentence("la musique commence", seed=9)
        a2, w2 = synth_sentence("la musique commence", seed=9)
        assert np.array_equal(a1, a2) and w1 == w2
        a3, _ = synth_sentence("la musique commence", seed=10)
        assert not np.array_equal(a1, a3)

    def test_every_g2p_phoneme_has_a_spec(self):
        assert set(G2P_PHONES) <= set(PHONES), set(G2P_PHONES) - set(PHONES)


class TestDomain:
    def test_f0_in_narrator_register(self):
        """YIN on the synthesized speech must sit in the measured 85–105 Hz
        narrator range (the whole point of the domain match)."""
        from prosody_control_french_tts_tpu.eval.yin import yin_f0

        meds = []
        for i, s in enumerate(sample_sentences(3, seed=7)):
            x, _ = synth_sentence(s, seed=200 + i)
            f0 = np.asarray(yin_f0(x.astype(np.float32), 16000, fmin=60, fmax=300))
            v = f0[(f0 > 60) & (f0 < 300)]
            assert len(v) > 10, s
            meds.append(float(np.median(v)))
        assert all(75.0 < m < 120.0 for m in meds), meds

    def test_level_near_corpus(self):
        # channel stage levels to RMS ≈ −20 dBFS (corpus ≈ −18 LUFS)
        x, _ = synth_sentence("nous allons parler des grands compositeurs", seed=4)
        rms_db = 20 * np.log10(np.sqrt(np.mean(np.square(x))) + 1e-12)
        assert -24.0 < rms_db < -16.0, rms_db

    def test_augment_off_is_clean(self):
        spec = FormantSpec(augment=False, vary=False)
        x, _ = synth_sentence("le portrait du compositeur", spec, seed=5)
        assert np.abs(x).max() <= 0.35

    def test_spectral_rolloff_matches_channel(self):
        """With augmentation the long-term spectrum must peak low (the
        measured narration LTAS peaks near 200 Hz and is ≥15 dB down by
        3.2 kHz)."""
        x, _ = synth_sentence("cette émission raconte une histoire", seed=6)
        F = 512
        fr = x[: len(x) // F * F].reshape(-1, F)
        mag = np.abs(np.fft.rfft(fr * np.hanning(F), axis=1)).mean(0)
        freqs = np.fft.rfftfreq(F, 1 / 16000)
        lo = mag[(freqs > 120) & (freqs < 400)].max()
        hi = mag[(freqs > 3000) & (freqs < 4000)].max()
        assert 20 * np.log10(lo / (hi + 1e-12)) > 12.0


class TestTrainingPath:
    def test_prep_batches_accepts_formant(self):
        """pretrain_whisper's supervision prep must keep formant sentences
        (byte spans resolve 1:1 against the sentence text)."""
        import jax

        jax.config.update("jax_platforms", "cpu")
        from prosody_control_french_tts_tpu.align.pretrain_whisper import (
            SynthSpec,
            _domain_synth,
            _prep_batches,
            synth_fr_config,
        )
        from prosody_control_french_tts_tpu.align.whisper_jax import WhisperAligner
        from prosody_control_french_tts_tpu.models.bpe_tokenizer import byte_level_french

        al = WhisperAligner(synth_fr_config(), tokenizer=byte_level_french())
        sents = sample_sentences(8, seed=0)
        mel, ids, n_text, tgt = _prep_batches(
            al, sents, SynthSpec(), 4, 0, _domain_synth("mixed")
        )
        assert mel.shape[0] == 8  # nothing dropped
        assert (n_text > 0).all()
        # every kept row has nonempty attention supervision on its bytes
        assert all(tgt[i, 1 : n_text[i]].any(axis=1).all() for i in range(8))
