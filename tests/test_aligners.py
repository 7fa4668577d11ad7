"""Aligner family tests: CTC aligner end-to-end training→alignment,
Whisper-JAX architecture + cross-attention timestamps + gates,
synchronized-SSML pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prosody_control_french_tts_tpu.align.ctc_aligner import CharVocab, CTCAligner, load_params, save_params
from prosody_control_french_tts_tpu.align.whisper_jax import (
    EMPTY_TEXT,
    WhisperAligner,
    WhisperConfig,
    WhisperModel,
    check_audio_content,
    group_word_times,
    token_times_from_cross_attention,
)
from prosody_control_french_tts_tpu.utils.wavio import Audio

SR = 16000


class TestCharVocab:
    def test_encode_and_spans(self):
        v = CharVocab()
        labels, spans = v.word_spans(["le", "chat"])
        assert len(labels) == 2 + 1 + 4  # 'le' + space + 'chat'
        assert spans == [(0, 2), (3, 7)]
        assert all(l > 0 for l in labels)


def _tone_word_audio(freqs, dur=0.25, gap=0.15):
    """Distinct tones per 'word' with silent gaps; highly separable
    features for the CTC model to learn."""
    chunks = []
    for f in freqs:
        t = np.arange(int(SR * dur)) / SR
        chunks.append(0.5 * np.sin(2 * np.pi * f * t))
        chunks.append(np.zeros(int(SR * gap)))
    return np.concatenate(chunks)


class TestCTCAligner:
    def test_train_and_align(self):
        """Train the tiny encoder to map tone A→'aa', tone B→'bb'; then
        forced alignment must place the words on their tones."""
        al = CTCAligner(dim=48, layers=1)
        al.init_params()
        init, step = al.make_train_step(lr=3e-3)
        opt = init(al.params)
        vocab = al.vocab

        x = _tone_word_audio([300.0, 1200.0])
        audio = Audio(x, SR)
        mel = al.features(audio)
        labels, spans = vocab.word_spans(["aa", "bb"])
        labels_j = jnp.asarray(labels, jnp.int32)
        T = mel.shape[0]
        params = al.params
        for i in range(60):
            params, opt, loss = step(params, opt, mel, jnp.int32(T // 2), labels_j, jnp.int32(len(labels)))
        al.params = params
        assert float(loss) < 10.0

        tg = al.align(audio, "aa bb")
        words = [iv for iv in tg.tiers[0] if iv.mark.strip()]
        assert [w.mark for w in words] == ["aa", "bb"]
        # first word within the first tone+gap region, second word after
        assert words[0].min_time < 0.3
        assert words[1].min_time > 0.25

    def test_save_load_roundtrip(self, tmp_path):
        al = CTCAligner(dim=32, layers=1)
        p = al.init_params()
        save_params(p, tmp_path / "w.npz")
        p2 = load_params(tmp_path / "w.npz")
        leaves1 = jax.tree.leaves(p)
        leaves2 = jax.tree.leaves(p2)
        assert len(leaves1) == len(leaves2)
        np.testing.assert_array_equal(np.asarray(leaves1[0]), np.asarray(leaves2[0]))


class TestWhisperArch:
    def test_forward_shapes(self):
        cfg = WhisperConfig.test()
        model = WhisperModel(cfg)
        mel = jnp.zeros((1, 100, cfg.n_mels))
        toks = jnp.asarray([[1, 2, 3]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), mel, toks)
        logits, cross = model.apply(params, mel, toks, True)
        assert logits.shape == (1, 3, cfg.vocab_size)
        assert len(cross) == cfg.dec_layers
        # encoder stride 2: frames = 50
        assert cross[0].shape[-1] == 50
        assert cross[0].shape[-2] == 3

    def test_decoder_causality(self):
        cfg = WhisperConfig.test()
        model = WhisperModel(cfg)
        mel = jnp.zeros((1, 60, cfg.n_mels))
        t1 = jnp.asarray([[5, 6, 7]], jnp.int32)
        t2 = jnp.asarray([[5, 6, 9]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), mel, t1)
        l1, _ = model.apply(params, mel, t1, False)
        l2, _ = model.apply(params, mel, t2, False)
        np.testing.assert_allclose(np.asarray(l1)[:, :2], np.asarray(l2)[:, :2], rtol=2e-2, atol=2e-3)


class TestTimestampDTW:
    def test_diagonal_attention_recovers_spans(self):
        # synthetic cross-attention: token i attends to frames [10i, 10i+10)
        n_tok, n_fr = 4, 40
        w = np.zeros((1, 2, n_tok, n_fr), np.float32)  # [batch? heads, tok, fr]
        for i in range(n_tok):
            w[0, :, i, 10 * i : 10 * i + 10] = 1.0
        spans = token_times_from_cross_attention([jnp.asarray(w)], n_fr, frame_dt=0.02)
        # each token ≈ 0.2 s long, monotonic
        for i in range(n_tok):
            assert abs(spans[i, 0] - 0.2 * i) < 0.05
        assert (np.diff(spans[:, 0]) > 0).all()

    def test_group_word_times(self):
        spans = np.array([[0.0, 0.1], [0.1, 0.2], [0.2, 0.4]])
        words = group_word_times([" bon", "jour", " monde"], spans)
        assert [w.word for w in words] == ["bon jour".replace(" ", "") if False else "bonjour", "monde"]
        assert words[0].start == 0.0 and abs(words[0].end - 0.2) < 1e-9
        assert abs(words[1].start - 0.2) < 1e-9


class TestGates:
    def test_silence_gate(self):
        ok, reason = check_audio_content(np.zeros(SR))
        assert not ok and "silence" in reason.lower() or "low" in reason.lower()

    def test_low_rms_gate(self):
        ok, _ = check_audio_content(np.ones(SR) * 1e-4)
        assert not ok

    def test_valid_audio(self):
        t = np.arange(SR) / SR
        ok, _ = check_audio_content(0.3 * np.sin(2 * np.pi * 220 * t))
        assert ok

    def test_aligner_placeholder_on_silence(self):
        al = WhisperAligner(WhisperConfig.test())
        tg = al.align(Audio(np.zeros(SR), SR))
        marks = [iv.mark for iv in tg.tiers[0] if iv.mark.strip()]
        assert marks == [EMPTY_TEXT]


class TestSynchronizedPipeline:
    def test_six_steps(self, tmp_path):
        from prosody_control_french_tts_tpu.core.synchronized import SynchronizedSSMLPipeline
        from prosody_control_french_tts_tpu.tts.fake import FakeBackend
        from prosody_control_french_tts_tpu.utils import wavio
        from prosody_control_french_tts_tpu.utils.textgridio import word_tier_with_silences, write_textgrid

        gen = FakeBackend(seed=4)
        audio_dir = tmp_path / "audio"
        tg_dir = tmp_path / "tg"
        txt_dir = tmp_path / "txt"
        for d in (audio_dir, tg_dir, txt_dir):
            d.mkdir()
        words = ["bonjour", "le", "monde."]
        t = 0.0
        chunks = []
        times = []
        for w in words:
            a = gen._voice(w, 0, 0, 0)
            times.append((t, t + len(a) / 44100, w))
            t += len(a) / 44100
            chunks.append(a)
            chunks.append(np.zeros(int(0.2 * 44100)))
            t += 0.2
        x = np.concatenate(chunks)
        wavio.write_wav(audio_dir / "segment_ph1.wav", x, 44100)
        write_textgrid(word_tier_with_silences(times, len(x) / 44100), tg_dir / "segment_ph1.TextGrid")
        (txt_dir / "segment_ph1.txt").write_text("bonjour le monde.")

        pipe = SynchronizedSSMLPipeline(
            audio_dir=audio_dir, textgrid_dir=tg_dir, transcription_dir=txt_dir,
            work_dir=tmp_path / "work", tts=FakeBackend(seed=8),
        )
        out = pipe.run_pipeline()
        assert out is not None and out.exists()
        assert (tmp_path / "work" / "ssml" / "SSML_V1_segment_ph1.xml").exists()
        v2 = (tmp_path / "work" / "ssml" / "SSML_V2_segment_ph1.xml").read_text()
        assert "<prosody rate=" in v2
        adj = pipe.adjustments["segment_ph1"]["rate_adjustment"]
        assert -50.0 <= adj <= 100.0


class TestDenoise:
    def test_spectral_gate_improves_snr(self):
        from prosody_control_french_tts_tpu.audio.denoise import denoise
        from prosody_control_french_tts_tpu.utils.wavio import Audio

        sr = 22050
        rng = np.random.default_rng(0)
        t = np.arange(sr * 2) / sr
        clean = 0.5 * np.sin(2 * np.pi * 300 * t) * (np.sin(2 * np.pi * 1.5 * t) > 0)
        noise = 0.03 * rng.normal(size=clean.size)
        noisy = clean + noise
        out = denoise(Audio(noisy, sr))
        assert out.samples.shape[0] == noisy.shape[0]

        def snr(y):
            sig = y[np.abs(clean) > 1e-3]
            res = y[np.abs(clean) <= 1e-3]
            return 10 * np.log10(np.mean(sig**2) / max(np.mean(res**2), 1e-12))

        assert snr(out.samples) > snr(noisy) + 3.0  # ≥3 dB cleaner gaps

    def test_silence_stays_silent(self):
        from prosody_control_french_tts_tpu.audio.denoise import denoise
        from prosody_control_french_tts_tpu.utils.wavio import Audio

        out = denoise(Audio(np.zeros(22050), 22050))
        assert np.abs(out.samples).max() < 1e-6


class TestWhisperChunking:
    def test_long_audio_windows(self):
        """>30 s audio aligns in windows with times offset back (tiny test
        config: window = n_audio_ctx·20 ms = 4 s)."""
        import jax

        cfg = WhisperConfig.test()  # n_audio_ctx=200 → 4 s window
        al = WhisperAligner(cfg)
        from prosody_control_french_tts_tpu.models.tokenizer import WordPieceTokenizer

        tok = WordPieceTokenizer.train(["bonjour le monde oui non merci bien sur"], vocab_size=120, min_freq=1)
        al.tokenizer = tok
        model_params = al.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 40, cfg.n_mels)), jnp.asarray([[1, 2]], jnp.int32)
        )
        al.params = model_params
        sr = 16000
        rng = np.random.default_rng(1)
        x = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr * 10) / sr) + 0.02 * rng.normal(size=sr * 10))
        words = "bonjour le monde oui non merci bien sur".split() * 3
        tg = al.align(Audio(x, sr), " ".join(words))
        marks = [iv for iv in tg.tiers[0] if iv.mark.strip()]
        assert len(marks) >= len(words) * 0.7  # most words placed
        # words exist beyond the first window
        assert any(iv.min_time > 4.0 for iv in marks)
        assert max(iv.max_time for iv in marks) <= 10.01


class TestCTCInPipeline:
    def test_aligner_switch_end_to_end(self, tmp_path):
        """Train the tiny CTC aligner on the fixture words, save weights,
        and run the pipeline's Align+Transcribe step with aligner: ctc —
        the reference's aligner-dispatch contract
        (pipeline_class_legacy.py:716-758) behind our config switch."""
        import jax.numpy as jnp
        from prosody_control_french_tts_tpu.align.ctc_aligner import CTCAligner, save_params
        from prosody_control_french_tts_tpu.core.config import PipelineConfig
        from prosody_control_french_tts_tpu.core.pipeline import AudioPipeline
        from prosody_control_french_tts_tpu.tts.fake import FakeBackend
        from prosody_control_french_tts_tpu.utils import wavio
        from prosody_control_french_tts_tpu.utils.textgridio import read_textgrid

        # one segment of two tone-words (the trainable toy domain)
        x = _tone_word_audio([300.0, 1200.0])
        sr = SR
        al = CTCAligner(dim=48, layers=1)
        al.init_params()
        init, step = al.make_train_step(lr=3e-3)
        opt = init(al.params)
        mel = al.features(Audio(x, sr))
        labels, _ = al.vocab.word_spans(["aa", "bb"])
        params = al.params
        for _ in range(60):
            params, opt, loss = step(
                params, opt, mel, jnp.int32(mel.shape[0] // 2),
                jnp.asarray(labels, jnp.int32), jnp.int32(len(labels)),
            )
        weights = tmp_path / "ctc.npz"
        save_params(params, weights)

        vdir = tmp_path / "Data" / "voice" / "cv"
        (vdir / "audio").mkdir(parents=True)
        (vdir / "transcription_raw").mkdir(parents=True)
        wavio.write_wav(vdir / "audio" / "segment_ph1.wav", x, sr)
        (vdir / "transcription_raw" / "segment_ph1.txt").write_text("aa bb")
        cfg = PipelineConfig.from_dict(
            {
                "data_dir": "Data/voice",
                "out_dir": "Out",
                "voice_names": ["cv"],
                "tts_backend": "fake",
                "aligner": "ctc",
                "aligner_options": {"weights_path": str(weights), "dim": 48, "layers": 1},
            },
            tmp_path,
        )
        pipe = AudioPipeline("cv", cfg, tts=FakeBackend(seed=1))
        pipe.align_and_transcribe()
        tg = read_textgrid(vdir / "WhisperTS_textgrid_files" / "segment_ph1.TextGrid")
        words = [iv.mark for iv in tg.tiers[0] if iv.mark.strip()]
        assert words == ["aa", "bb"]
        assert (vdir / "transcription" / "segment_ph1.txt").read_text().strip() == "aa bb"


class TestTrainCTCDriver:
    def test_recipe_end_to_end(self, tmp_path):
        from prosody_control_french_tts_tpu.align.train_ctc import train_ctc_aligner
        from prosody_control_french_tts_tpu.align.ctc_aligner import CTCAligner
        from prosody_control_french_tts_tpu.utils import wavio

        # tiny tone-word corpus: 'aa'→300 Hz, 'bb'→1200 Hz
        for i in range(3):
            x = _tone_word_audio([300.0, 1200.0])
            wavio.write_wav(tmp_path / f"u{i}.wav", x, SR)
            (tmp_path / f"u{i}.txt").write_text("aa bb")
        al, losses = train_ctc_aligner(
            tmp_path, tmp_path / "w.npz", epochs=20, lr=3e-3, dim=48, layers=1
        )
        assert losses[-1] < losses[0]
        assert (tmp_path / "w.npz").exists()
        # reload through the aligner_options path and align
        al2 = CTCAligner(dim=48, layers=1, weights_path=tmp_path / "w.npz")
        tg = al2.align(Audio(_tone_word_audio([300.0, 1200.0]), SR), "aa bb")
        words = [iv.mark for iv in tg.tiers[0] if iv.mark.strip()]
        assert words == ["aa", "bb"]


class TestG2P:
    """French G2P + phoneme-target CTC (reference: enrichir_dictionnaire.py
    — lexicon-first OOV enrichment, here with a hermetic rule engine)."""

    def test_known_words(self):
        from prosody_control_french_tts_tpu.align.g2p_fr import g2p_word

        assert g2p_word("bonjour") == ["b", "ɔ̃", "ʒ", "u", "ʁ"]
        assert g2p_word("eau") == ["o"]
        assert g2p_word("nation") == ["n", "a", "s", "j", "ɔ̃"]
        assert g2p_word("maison") == ["m", "ɛ", "z", "ɔ̃"]      # intervocalic s → z
        assert g2p_word("famille") == ["f", "a", "m", "i", "j"]
        assert g2p_word("guerre") == ["ɡ", "ɛ", "ʁ"]             # geminate collapsed
        assert g2p_word("chat") == ["ʃ", "a"]                    # silent final t
        assert g2p_word("deux") == ["d", "ø"]
        assert g2p_word("") == []
        assert g2p_word("xyz123") != []                          # total function

    def test_lexicon_enrichment(self, tmp_path):
        from prosody_control_french_tts_tpu.align.g2p_fr import (
            enrich_lexicon_file,
            load_lexicon,
        )

        tr = tmp_path / "transcription"
        tr.mkdir()
        (tr / "a.txt").write_text("Bonjour le monde.", encoding="utf-8")
        (tr / "b.txt").write_text("Le monde est grand !", encoding="utf-8")
        lex = tmp_path / "lexicon.txt"
        lex.write_text("le l ə\n", encoding="utf-8")
        added = enrich_lexicon_file(tr, lex)
        out = load_lexicon(lex)
        assert added == 4  # bonjour, monde, est, grand (le already present)
        assert out["le"] == ["l", "ə"]           # existing entry untouched
        assert out["monde"] == ["m", "ɔ̃", "d"]
        assert enrich_lexicon_file(tr, lex) == 0  # idempotent

    def test_phoneme_vocab_ctc_align(self):
        """CTCAligner works with phoneme targets as a drop-in vocab."""
        from prosody_control_french_tts_tpu.align.g2p_fr import PhonemeVocab

        vocab = PhonemeVocab(lexicon={"aa": ["a"], "oo": ["o"]})
        al = CTCAligner(dim=48, layers=1, vocab=vocab)
        al.init_params()
        init, step = al.make_train_step(lr=3e-3)
        opt = init(al.params)

        audio = Audio(_tone_word_audio([300.0, 1200.0]), SR)
        mel = al.features(audio)
        labels, spans = vocab.word_spans(["aa", "oo"])
        assert labels == [vocab.encode("aa")[0], vocab.boundary, vocab.encode("oo")[0]]
        labels_j = jnp.asarray(labels, jnp.int32)
        params = al.params
        for _ in range(60):
            params, opt, loss = step(
                params, opt, mel, jnp.int32(mel.shape[0] // 2), labels_j, jnp.int32(len(labels))
            )
        al.params = params
        tg = al.align(audio, "aa oo")
        words = [iv for iv in tg.tiers[0] if iv.mark.strip()]
        assert [w.mark for w in words] == ["aa", "oo"]
        assert words[0].min_time < 0.3 < words[1].max_time


class TestVADAndDisfluency:
    """Reference transcription semantics: vad="auditok", no-VAD retry on
    short audio, detect_disfluencies (use_whisper_timestamped.py:150-170)."""

    def _speech_like(self, sr=16000, spans=((0.6, 1.5), (2.4, 3.3)), total=3.9):
        rng = np.random.default_rng(0)
        x = np.zeros(int(total * sr), np.float32)
        for s, e in spans:
            t = np.arange(int((e - s) * sr)) / sr
            x[int(s * sr) : int(s * sr) + len(t)] = 0.3 * np.sin(2 * np.pi * 180 * t) * (
                0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t)
            )
        return x + 0.001 * rng.normal(size=len(x)).astype(np.float32)

    def test_vad_finds_speech_regions(self):
        from prosody_control_french_tts_tpu.align.whisper_jax import vad_speech_regions
        from prosody_control_french_tts_tpu.utils.wavio import Audio

        x = self._speech_like()
        regions = vad_speech_regions(Audio(x, 16000))
        assert len(regions) == 2
        (a0, a1), (b0, b1) = regions
        assert abs(a0 - 0.6) < 0.2 and abs(a1 - 1.5) < 0.2
        assert abs(b0 - 2.4) < 0.2 and abs(b1 - 3.3) < 0.2

    def test_vad_short_audio_raises_max_silence(self):
        from prosody_control_french_tts_tpu.align.whisper_jax import vad_speech_regions
        from prosody_control_french_tts_tpu.utils.wavio import Audio

        with pytest.raises(ValueError, match="max_silence"):
            vad_speech_regions(Audio(np.ones(4000, np.float32) * 0.3, 16000))

    def test_align_short_audio_retries_without_vad(self, monkeypatch):
        """0.25 s of audio fails the VAD windowing; align() must fall back
        to the no-VAD path and still produce words (ref :163-170)."""
        from prosody_control_french_tts_tpu.models.tokenizer import WordPieceTokenizer
        import prosody_control_french_tts_tpu.align.whisper_jax as WJ

        cfg = WhisperConfig.test()
        tok = WordPieceTokenizer.train(["oui non"], vocab_size=60, min_freq=1)
        al = WhisperAligner(cfg, tokenizer=tok, use_vad=True, detect_disfluencies=False)
        al.params = al.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 40, cfg.n_mels)), jnp.asarray([[1, 2]], jnp.int32)
        )

        def fake_spans(cross, n_frames, frame_dt=0.02):
            n_tok = cross[0].shape[-2]
            return np.array([[0.02 * i, 0.02 * (i + 1)] for i in range(n_tok)])

        monkeypatch.setattr(WJ, "token_times_from_cross_attention", fake_spans)
        sr = 16000
        t = np.arange(int(0.25 * sr)) / sr
        audio = Audio((0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), sr)
        tg = al.align(audio, "oui non")
        marks = [iv.mark for iv in tg.tiers[0] if iv.mark.strip()]
        assert marks == ["oui", "non"]

    def test_vad_regions_offset_word_times(self, monkeypatch):
        """With two speech islands, transcript words are apportioned per
        region and their times land inside the right island."""
        from prosody_control_french_tts_tpu.models.tokenizer import WordPieceTokenizer
        import prosody_control_french_tts_tpu.align.whisper_jax as WJ

        cfg = WhisperConfig.test()
        tok = WordPieceTokenizer.train(["oui non"], vocab_size=60, min_freq=1)
        al = WhisperAligner(cfg, tokenizer=tok, use_vad=True, detect_disfluencies=False)
        al.params = al.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 40, cfg.n_mels)), jnp.asarray([[1, 2]], jnp.int32)
        )

        def fake_spans(cross, n_frames, frame_dt=0.02):
            n_tok = cross[0].shape[-2]
            return np.array([[0.05 * i, 0.05 * (i + 1)] for i in range(n_tok)])

        monkeypatch.setattr(WJ, "token_times_from_cross_attention", fake_spans)
        x = self._speech_like()
        tg = al.align(Audio(x, 16000), "oui non")
        words = [iv for iv in tg.tiers[0] if iv.mark.strip()]
        assert [w.mark for w in words] == ["oui", "non"]
        assert words[0].min_time < 1.7  # first island
        assert words[1].min_time > 2.2  # second island

    def test_disfluency_marker_becomes_pause(self):
        """A word-stream gap inside detected speech gets the [*] marker,
        which surfaces as a silence interval in the TextGrid (ref :375
        replaces the marker with ' ')."""
        from prosody_control_french_tts_tpu.align.whisper_jax import (
            DISFLUENCY_MARK,
            mark_disfluencies,
        )
        from prosody_control_french_tts_tpu.align.base import AlignedWord

        words = [AlignedWord(0.1, 0.4, "bonjour"), AlignedWord(1.2, 1.5, "monde")]
        out = mark_disfluencies(words, [(0.0, 1.6)], min_gap_s=0.3)
        assert [w.word for w in out] == ["bonjour", DISFLUENCY_MARK, "monde"]
        assert out[1].start == pytest.approx(0.4) and out[1].end == pytest.approx(1.2)
        # gap outside speech → no marker
        out2 = mark_disfluencies(words, [(0.0, 0.5)], min_gap_s=0.3)
        assert [w.word for w in out2] == ["bonjour", "monde"]


class TestFromPretrained:
    def test_save_load_roundtrip_with_bpe(self, tmp_path, monkeypatch):
        from prosody_control_french_tts_tpu.models.bpe_tokenizer import synthetic_multilingual
        import prosody_control_french_tts_tpu.align.whisper_jax as WJ

        cfg = WhisperConfig.test(vocab_size=52000)
        tok = synthetic_multilingual()
        al = WhisperAligner(cfg, tokenizer=tok, use_vad=False, detect_disfluencies=False)
        al.params = al.model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 40, cfg.n_mels)), jnp.asarray([[1, 2]], jnp.int32)
        )
        al.save_pretrained(tmp_path / "ckpt")
        al2 = WhisperAligner.from_pretrained(
            tmp_path / "ckpt", use_vad=False, detect_disfluencies=False
        )
        assert al2.cfg.vocab_size == 52000 and al2.cfg.dim == cfg.dim
        assert al2.tokenizer.encode("bonjour") == tok.encode("bonjour")

        def fake_spans(cross, n_frames, frame_dt=0.02):
            n_tok = cross[0].shape[-2]
            return np.array([[0.05 * i, 0.05 * (i + 1)] for i in range(n_tok)])

        monkeypatch.setattr(WJ, "token_times_from_cross_attention", fake_spans)
        sr = 16000
        t = np.arange(sr) / sr
        audio = Audio((0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
        tg = al2.align(audio, "bonjour le monde")
        marks = [iv.mark for iv in tg.tiers[0] if iv.mark.strip()]
        assert marks == ["bonjour", "le", "monde"]


class TestDeviceSpans:
    """The fused on-device DTW+backtrack (align_batch's production path)
    must match the host oracle exactly: same normalisation, same DP, same
    tie rule."""

    def test_partition_spans_batched_matches_host_backtrack(self):
        from prosody_control_french_tts_tpu.ops.dtw import (
            monotonic_partition_backtrack,
            monotonic_partition_costs,
            monotonic_partition_spans_batched,
        )

        rng = np.random.default_rng(3)
        B, L, F = 4, 24, 300
        cost = np.zeros((B, L, F), np.float32)
        nt = np.array([3, 24, 1, 17], np.int32)
        nf = np.array([300, 211, 37, 256], np.int32)
        for b in range(B):
            cost[b, : nt[b], : nf[b]] = -np.abs(
                rng.standard_normal((nt[b], nf[b]))
            ).astype(np.float32)
        dev = np.asarray(
            monotonic_partition_spans_batched(jnp.asarray(cost), jnp.asarray(nt), jnp.asarray(nf))
        )
        for b in range(B):
            D = np.asarray(monotonic_partition_costs(jnp.asarray(cost[b])))
            host = monotonic_partition_backtrack(D[: nt[b] + 1, : nf[b] + 1])
            np.testing.assert_allclose(dev[b, : nt[b]], host, atol=0)
            assert (dev[b, nt[b] :] == 0).all()

    def test_attention_spans_device_matches_host_oracle(self):
        from prosody_control_french_tts_tpu.align.whisper_jax import (
            _attention_spans_device,
            spans_from_attention,
        )

        rng = np.random.default_rng(5)
        B, R, F = 3, 9, 120  # R = 1 sot row + 8 token rows
        att = np.abs(rng.standard_normal((B, R, F))).astype(np.float32)
        n = np.array([8, 3, 1], np.int32)
        fr = np.array([120, 77, 40], np.int32)
        dev = np.asarray(
            _attention_spans_device(jnp.asarray(att), jnp.asarray(n), jnp.asarray(fr), R - 1)
        )
        for b in range(B):
            host = spans_from_attention(att[b, 1 : 1 + n[b], : fr[b]], frame_dt=1.0)
            np.testing.assert_allclose(dev[b, : n[b]], host, atol=0)
