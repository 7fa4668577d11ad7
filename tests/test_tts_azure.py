"""Azure backend unit coverage (no network): RIFF decode, SSML helpers,
retry/fallback wiring via a stubbed transport."""

import struct

import numpy as np
import pytest

from prosody_control_french_tts_tpu.tts.azure import AzureBackend, _decode_riff
from prosody_control_french_tts_tpu.tts.base import (
    TTSError,
    extract_breaks_ms,
    extract_prosody,
    extract_text,
    simplify_ssml,
)


def riff_bytes(samples: np.ndarray, rate: int = 44100) -> bytes:
    pcm = np.clip(np.round(samples * 32768), -32768, 32767).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


class TestRiffDecode:
    def test_roundtrip(self):
        x = np.linspace(-0.5, 0.5, 1000)
        a = _decode_riff(riff_bytes(x, 24000))
        assert a.rate == 24000
        assert np.abs(a.samples - x).max() < 1e-4

    def test_rejects_non_riff(self):
        with pytest.raises(TTSError, match="non-RIFF"):
            _decode_riff(b"OggS" + b"\0" * 100)

    def test_rejects_missing_data(self):
        hdr = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
        with pytest.raises(TTSError, match="data"):
            _decode_riff(hdr)


class TestSSMLHelpers:
    SSML = (
        '<speak xmlns="http://www.w3.org/2001/10/synthesis" version="1.0" xml:lang="fr-FR">'
        '<voice name="v"><prosody pitch="+1.50%" rate="-2.00%" volume="+0.25%">bonjour le monde'
        '<break time="300ms"/></prosody></voice></speak>'
    )

    def test_extract_text(self):
        assert extract_text(self.SSML) == "bonjour le monde"

    def test_extract_breaks(self):
        assert extract_breaks_ms(self.SSML) == [300]

    def test_extract_prosody(self):
        assert extract_prosody(self.SSML) == (1.5, -2.0, 0.25)

    def test_simplify(self):
        s = simplify_ssml(self.SSML, "fr-FR-HenriNeural")
        assert "<prosody" not in s and "bonjour le monde" in s
        assert 'name="fr-FR-HenriNeural"' in s


class TestAzureRetry:
    def test_1007_fallback_uses_simplified(self, monkeypatch):
        import urllib.error

        be = AzureBackend("key", max_retries=1)
        calls = []

        def fake_post(ssml):
            calls.append(ssml)
            if len(calls) == 1:
                raise urllib.error.HTTPError(be._url, 400, "bad ssml", {}, None)
            return riff_bytes(np.zeros(100))

        monkeypatch.setattr(be, "_post", fake_post)
        audio = be.synthesize(TestSSMLHelpers.SSML)
        assert audio.rate == 44100
        assert len(calls) == 2
        assert "<prosody" not in calls[1]  # simplified document

    def test_persistent_failure_raises(self, monkeypatch):
        be = AzureBackend("key", max_retries=2)

        def fake_post(ssml):
            raise ConnectionError("no network")

        monkeypatch.setattr(be, "_post", fake_post)
        monkeypatch.setattr("time.sleep", lambda s: None)
        with pytest.raises(TTSError, match="after retries"):
            be.synthesize("<speak/>")


class TestBreaksEdgeCases:
    def test_empty_inputs(self):
        from prosody_control_french_tts_tpu.eval.breaks import compare_breaks
        from prosody_control_french_tts_tpu.utils.textgridio import TextGrid, IntervalTier

        tg = TextGrid(0, 1)
        tg.append(IntervalTier("words", 0, 1))
        rep = compare_breaks([], tg)
        assert rep.total == 0

    def test_no_silence_after_last_block(self):
        from prosody_control_french_tts_tpu.eval.breaks import compare_breaks
        from prosody_control_french_tts_tpu.utils.textgridio import word_tier_with_silences

        tg = word_tier_with_silences([(0.0, 0.5, "bonjour monde")], total_duration=0.5)
        rows = [
            {"segment": "s1", "syntagme": "bonjour monde", "pause": 0},
            {"segment": "s1", "syntagme": "", "pause": 200},
        ]
        rep = compare_breaks(rows, tg)
        assert rep.total == 1
        assert rep.rows[0]["synth_voice_ms"] == 0  # no trailing silence
