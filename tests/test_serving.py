"""Serving layer: micro-batcher semantics + live HTTP service."""

import json
import threading
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prosody_control_french_tts_tpu.models.bert import BertConfig, BreakTagger
from prosody_control_french_tts_tpu.models.tokenizer import WordPieceTokenizer
from prosody_control_french_tts_tpu.serving.batcher import MicroBatcher
from prosody_control_french_tts_tpu.serving.predictor import SSMLPredictor


class TestMicroBatcher:
    def test_batches_concurrent_requests(self):
        batch_sizes = []

        def fn(items):
            batch_sizes.append(len(items))
            return [i * 2 for i in items]

        b = MicroBatcher(fn, max_batch=16, max_wait_ms=30)
        with ThreadPoolExecutor(max_workers=8) as ex:
            results = list(ex.map(lambda i: b.submit(i), range(8)))
        assert sorted(results) == [i * 2 for i in range(8)]
        assert max(batch_sizes) > 1  # actually batched
        b.close()

    def test_error_propagates(self):
        def fn(items):
            raise RuntimeError("kaboom")

        b = MicroBatcher(fn, max_batch=4, max_wait_ms=1)
        with pytest.raises(RuntimeError, match="kaboom"):
            b.submit(1)
        b.close()


@pytest.fixture(scope="module")
def predictor():
    texts = ["bonjour le monde merci", "la voix parle bien fort", "un deux trois quatre"]
    tok = WordPieceTokenizer.train(texts, vocab_size=200, min_freq=1)
    cfg = BertConfig(vocab_size=len(tok), hidden=32, layers=1, heads=2, ffn=64, max_len=32)
    model = BreakTagger(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32), jnp.int32), jnp.ones((1, 32), bool))
    return SSMLPredictor(tok, cfg, params, max_wait_ms=2)


class TestPredictor:
    def test_predict_shape(self, predictor):
        out = predictor.predict("bonjour le monde")
        assert out["words"] == ["bonjour", "le", "monde"]
        assert len(out["breaks"]) == 3
        assert out["ssml"].startswith("<speak")

    def test_http_service(self, predictor):
        httpd = predictor.serve(port=0)
        port = httpd.server_address[1]
        try:
            h = json.loads(urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz").read())
            assert h["status"] == "ok"
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/ssml",
                data=json.dumps({"text": "bonjour le monde"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            out = json.loads(urllib.request.urlopen(req).read())
            assert out["words"] == ["bonjour", "le", "monde"]
            # concurrent load through the live server exercises batching
            def hit(i):
                r = urllib.request.Request(
                    f"http://127.0.0.1:{port}/ssml",
                    data=json.dumps({"text": f"un deux trois {i}"}).encode(),
                )
                return json.loads(urllib.request.urlopen(r).read())

            with ThreadPoolExecutor(max_workers=6) as ex:
                outs = list(ex.map(hit, range(12)))
            assert all(o["ssml"].startswith("<speak") for o in outs)
        finally:
            httpd.shutdown()


class TestProsodyServing:
    def test_prosody_values_in_ssml(self):
        from prosody_control_french_tts_tpu.models.bert import SentenceEncoder
        from prosody_control_french_tts_tpu.models.bilstm import BiLSTMConfig, BiLSTMProsody
        from prosody_control_french_tts_tpu.models.tokenizer import WordPieceTokenizer

        texts = ["bonjour le monde", "la voix parle"]
        tok = WordPieceTokenizer.train(texts, vocab_size=150, min_freq=1)
        cfg = BertConfig(vocab_size=len(tok), hidden=32, layers=1, heads=2, ffn=64, max_len=16)
        tagger = BreakTagger(cfg)
        params = tagger.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool)
        )
        enc = SentenceEncoder(cfg)
        enc_params = enc.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 16), jnp.int32), jnp.ones((1, 16), bool)
        )
        reg = BiLSTMProsody(BiLSTMConfig(embed_dim=cfg.hidden))
        reg_params = reg.init(jax.random.PRNGKey(2), jnp.zeros((1, 1, cfg.hidden)))
        pred = SSMLPredictor(
            tok, cfg, params, max_wait_ms=1,
            prosody={"bilstm_params": reg_params, "encoder_params": enc_params,
                     "mu": np.zeros(3), "sd": np.ones(3)},
        )
        out = pred.predict("bonjour le monde")
        assert "prosody" in out
        assert "<prosody pitch=" in out["ssml"]
        import re as _re
        assert _re.search(r'pitch="[+-]\d+\.\d{2}%"', out["ssml"])
