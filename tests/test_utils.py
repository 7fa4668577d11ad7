"""Tests for host-side utilities (WAV, TextGrid, POS, text)."""

import numpy as np
import pytest

from prosody_control_french_tts_tpu.utils import fr_pos, text, textgridio, wavio


class TestWavio:
    def test_roundtrip(self, tmp_path, rng):
        x = (rng.normal(size=4410) * 0.3).clip(-1, 1)
        p = tmp_path / "t.wav"
        wavio.write_wav(p, x, 44100)
        a = wavio.read_wav(p)
        assert a.rate == 44100
        assert a.samples.shape == (4410,)
        assert np.abs(a.samples - x).max() < 1e-4  # 16-bit quantisation

    def test_stereo_to_mono(self, tmp_path, rng):
        x = np.stack([np.ones(100) * 0.5, np.zeros(100)], axis=1)
        p = tmp_path / "s.wav"
        wavio.write_wav(p, x, 8000)
        a = wavio.read_wav(p)
        assert a.num_channels == 2
        m = a.to_mono()
        assert abs(m.samples.mean() - 0.25) < 1e-3

    def test_reads_reference_corpus(self, corpus_wavs):
        a = wavio.read_wav(corpus_wavs[0])
        assert a.rate == 44100
        assert a.duration_seconds > 1.0

    def test_slice_ms(self):
        a = wavio.Audio(np.arange(44100, dtype=np.float64) / 44100, 44100)
        s = a.slice_ms(100, 350)
        assert s.samples.shape[0] == int(250 * 44.1)

    def test_silence_and_fade(self):
        s = wavio.silence(250, 44100)
        assert s.samples.shape[0] == int(0.25 * 44100)
        x = wavio.fade(np.ones(1000), 44100, fade_in_ms=5, fade_out_ms=5)
        assert x[0] == 0.0 and x[-1] < 0.01 and x[500] == 1.0

    def test_resample(self):
        t = np.arange(44100) / 44100
        x = np.sin(2 * np.pi * 440 * t)
        a = wavio.resample(wavio.Audio(x, 44100), 16000)
        assert a.rate == 16000
        assert abs(a.samples.shape[0] - 16000) <= 2


class TestTextGrid:
    def test_roundtrip(self, tmp_path):
        tg = textgridio.word_tier_with_silences(
            [(0.5, 0.9, "bonjour"), (1.1, 1.6, "monde,")], total_duration=2.0
        )
        p = tmp_path / "x.TextGrid"
        textgridio.write_textgrid(tg, p)
        tg2 = textgridio.read_textgrid(p)
        marks = [(round(i.min_time, 3), round(i.max_time, 3), i.mark) for i in tg2.tiers[0]]
        assert marks == [
            (0.0, 0.5, ""),
            (0.5, 0.9, "bonjour"),
            (0.9, 1.1, ""),
            (1.1, 1.6, "monde,"),
            (1.6, 2.0, ""),
        ]

    def test_parses_short_format(self, tmp_path):
        short = (
            '"ooTextFile"\n"TextGrid"\n0 2.5\n<exists>\n1\n"IntervalTier"\n"words"\n'
            '0 2.5\n2\n0 1.2 "salut"\n1.2 2.5 ""\n'
        )
        p = tmp_path / "s.TextGrid"
        p.write_text(short)
        tg = textgridio.read_textgrid(p)
        assert len(tg.tiers[0]) == 2
        assert tg.tiers[0].intervals[0].mark == "salut"
        assert tg.max_time == 2.5

    def test_quotes_escaped(self, tmp_path):
        tg = textgridio.word_tier_with_silences([(0.0, 1.0, 'dit "oui"')], 1.0)
        p = tmp_path / "q.TextGrid"
        textgridio.write_textgrid(tg, p)
        tg2 = textgridio.read_textgrid(p)
        assert tg2.tiers[0].intervals[0].mark == 'dit "oui"'


class TestFrPos:
    @pytest.mark.parametrize(
        "word,expected",
        [
            ("le", "DET"),
            ("la", "DET"),
            ("des", "DET"),
            ("dans", "ADP"),
            ("avec", "ADP"),
            ("et", "CCONJ"),
            ("mais", "CCONJ"),
            ("que", "SCONJ"),
            ("lorsque", "SCONJ"),
            ("ne", "PART"),
            ("maison", "X"),
            ("parler", "X"),
            ("Bonjour", "X"),
        ],
    )
    def test_tags(self, word, expected):
        assert fr_pos.pos_tag(word) == expected

    def test_elision(self):
        assert fr_pos.pos_tag("l'") == "DET"
        assert fr_pos.pos_tag("d'accord") in ("ADP",)  # d' elision
        assert fr_pos.is_function_word("qu'il")

    def test_function_word_filter(self):
        # the reference's pause filter: no pause after DET/ADP/... tokens
        # (Code/audioPipeline.py:451-465)
        assert fr_pos.is_function_word("le")
        assert fr_pos.is_function_word("pour")
        assert not fr_pos.is_function_word("maison")

    def test_first_token_pos(self):
        assert fr_pos.first_token_pos("le chat") == "DET"
        assert fr_pos.first_token_pos("chat noir") == "X"

    def test_remove_spurious_commas(self):
        # comma after DET "le" removed; comma after noun kept
        assert fr_pos.remove_spurious_commas("le, chat dort") == "le chat dort"
        out = fr_pos.remove_spurious_commas("le chat, dort")
        assert out == "le chat, dort"


class TestText:
    def test_normalize_word(self):
        assert text.normalize_word("Élégant!") == "elegant"
        assert text.normalize_word("où,") == "ou"
        assert text.normalize_word(None) == ""

    def test_clean_transcript(self):
        assert text.clean_transcript("bonjour [rire], le monde; oui") == "bonjour le monde oui"

    def test_ends_sentence(self):
        assert text.ends_sentence("fini.")
        assert text.ends_sentence("quoi ?")
        assert not text.ends_sentence("virgule,")

    def test_levenshtein(self):
        assert text.levenshtein("chat", "chats") == 1
        assert text.levenshtein("bonjour", "bonjour") == 0
        assert text.levenshtein("abc", "xbc") == 1

    def test_xml_escape(self):
        assert text.xml_escape("a & b < c") == "a &amp; b &lt; c"


class TestWavInfo:
    def test_header_probe(self, tmp_path, rng):
        from prosody_control_french_tts_tpu.utils.wavio import wav_info, write_wav

        x = rng.normal(size=12345) * 0.1
        write_wav(tmp_path / "p.wav", x, 22050)
        n, rate = wav_info(tmp_path / "p.wav")
        assert n == 12345 and rate == 22050


class TestTTSBatch:
    def test_folder_synthesis_with_resume(self, tmp_path):
        from prosody_control_french_tts_tpu.tts.batch import clean_ssml_for_azure, process_ssml_folder
        from prosody_control_french_tts_tpu.tts.fake import FakeBackend

        ssml_dir = tmp_path / "xml"
        ssml_dir.mkdir()
        for i in range(3):
            (ssml_dir / f"{i:04d}.xml").write_text(
                '<?xml version="1.0"?>\n<speak xmlns="http://www.w3.org/2001/10/synthesis" '
                'version="1.0" xml:lang="fr-FR">\n  <voice name="v">\n    '
                f"<prosody pitch=\"+1.00%\" rate=\"+0.00%\" volume=\"+0.00%\">mot {i}</prosody>\n"
                "  </voice>\n</speak>"
            )
        tts = FakeBackend(seed=2)
        ok, bad = process_ssml_folder(tts, ssml_dir, tmp_path / "wav")
        assert (ok, bad) == (3, 0)
        calls = tts.calls
        # resume: nothing re-synthesized
        ok2, _ = process_ssml_folder(tts, ssml_dir, tmp_path / "wav")
        assert ok2 == 3 and tts.calls == calls
        cleaned = clean_ssml_for_azure('<?xml version="1.0"?>\n<speak>  <a> </a>  </speak>')
        assert cleaned.startswith("<speak>") and "?xml" not in cleaned
