"""Azure Cognitive Services TTS over plain REST (stdlib urllib).

The reference uses the ``azure.cognitiveservices.speech`` SDK
(Code/Preprocessing/get_synth.py:36-44, synthesize_ssml_voice.py:168-228);
this client speaks the same service's REST endpoint so the framework has
no native SDK dependency. Behavioural parity:

- output format riff-44100hz-16bit-mono-pcm (the SDK default the pipeline
  stitches against);
- on synthesis errors that correspond to invalid SSML (HTTP 400 — the
  SDK's cancellation error 1007), retry once with the simplified
  plain-text document (synthesize_ssml_voice.py:217-228);
- bounded retries with backoff on 429/5xx (synthesize_ssml_voice.py retries
  three times around transient failures).
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request

import numpy as np

from ..utils.wavio import Audio
from .base import TTSError, simplify_ssml


class AzureBackend:
    sample_rate = 44100

    def __init__(
        self,
        api_key: str,
        region: str = "francecentral",
        voice: str = "fr-FR-HenriNeural",
        max_retries: int = 3,
        timeout_s: float = 30.0,
    ):
        self.api_key = api_key
        self.region = region
        self.voice = voice
        self.max_retries = max_retries
        self.timeout_s = timeout_s

    @property
    def _url(self) -> str:
        return f"https://{self.region}.tts.speech.microsoft.com/cognitiveservices/v1"

    def _post(self, ssml: str) -> bytes:
        req = urllib.request.Request(
            self._url,
            data=ssml.encode("utf-8"),
            headers={
                "Ocp-Apim-Subscription-Key": self.api_key,
                "Content-Type": "application/ssml+xml",
                "X-Microsoft-OutputFormat": "riff-44100hz-16bit-mono-pcm",
                "User-Agent": "prosody-control-french-tts-tpu",
            },
            method="POST",
        )
        return urllib.request.urlopen(req, timeout=self.timeout_s).read()

    def synthesize(self, ssml: str) -> Audio:
        last: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                raw = self._post(ssml)
                return _decode_riff(raw)
            except urllib.error.HTTPError as e:
                if e.code == 400:
                    # invalid SSML (SDK error 1007): simplified fallback
                    try:
                        raw = self._post(simplify_ssml(ssml, self.voice))
                        return _decode_riff(raw)
                    except Exception as e2:  # noqa: BLE001
                        raise TTSError(f"Azure rejected SSML and fallback: {e2}", code=1007) from e2
                if e.code in (429, 500, 502, 503) and attempt + 1 < self.max_retries:
                    time.sleep(2.0**attempt)
                    last = e
                    continue
                raise TTSError(f"Azure HTTP {e.code}", code=e.code) from e
            except Exception as e:  # noqa: BLE001 (network failures)
                last = e
                if attempt + 1 < self.max_retries:
                    time.sleep(2.0**attempt)
                    continue
        raise TTSError(f"Azure synthesis failed after retries: {last}")


def _decode_riff(raw: bytes) -> Audio:
    import struct

    if raw[:4] != b"RIFF":
        raise TTSError("Azure returned non-RIFF payload")
    # minimal parse: find data chunk; format is known (44.1k/16bit/mono)
    pos = 12
    data = None
    rate = 44100
    while pos + 8 <= len(raw):
        cid, size = raw[pos : pos + 4], struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        if cid == b"fmt ":
            rate = struct.unpack("<I", raw[pos + 12 : pos + 16])[0]
        elif cid == b"data":
            data = raw[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if data is None:
        raise TTSError("Azure RIFF payload missing data chunk")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float32) * np.float32(1.0 / 32768.0)
    return Audio(samples, rate)
