"""SSML prediction service: text → SSML with predicted breaks (+ prosody).

The deployment shape of the trained models: the break tagger marks pause
positions (the reference's pause_bert inference), optionally the BiLSTM
regressor fills pitch/volume/rate percentages, and the SSML builder emits
the document. One jitted forward per micro-batch; padded to the model's
max_len, static shapes.

HTTP front-end (stdlib): POST /ssml {"text": …} | {"texts": […]},
GET /healthz.
"""

from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bert import BertConfig, BreakTagger
from ..models.tokenizer import WordPieceTokenizer
from .batcher import MicroBatcher

log = logging.getLogger(__name__)


class SSMLPredictor:
    def __init__(
        self,
        tokenizer: WordPieceTokenizer,
        cfg: BertConfig,
        params,
        break_ms: int = 250,
        voice: str = "fr-FR-HenriNeural",
        max_batch: int = 32,
        max_wait_ms: float = 4.0,
        prosody: dict | None = None,
    ):
        """``prosody`` (optional) enables pitch/rate/volume prediction:
        {"bilstm_params": …, "encoder_params": …, "mu": [3], "sd": [3]}
        — the BiLSTM regressor over SentenceEncoder embeddings with its
        z-score calibration (models.bilstm)."""
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.model = BreakTagger(cfg)
        self.params = params
        self.break_ms = break_ms
        self.voice = voice

        # params as an argument (closing over them would inline ~all model
        # weights as HLO constants — remote compilers reject such payloads)
        self._fwd = jax.jit(lambda p, ids, mask: self.model.apply(p, ids, mask))

        self.prosody = prosody
        if prosody is not None:
            from ..models.bert import SentenceEncoder
            from ..models.bilstm import BiLSTMConfig, BiLSTMProsody

            self._enc = SentenceEncoder(cfg)
            self._reg = BiLSTMProsody(BiLSTMConfig(embed_dim=cfg.hidden))
            self._embed = jax.jit(lambda p, ids, mask: self._enc.apply(p, ids, mask))
            self._regress = jax.jit(lambda p, e: self._reg.apply(p, e))

        self.batcher = MicroBatcher(self._predict_batch, max_batch=max_batch, max_wait_ms=max_wait_ms)

    # -- core -----------------------------------------------------------
    def _bucket(self, n: int) -> int:
        """Pad the micro-batch to the next power of two, clamped to
        max_batch: under live traffic the collected batch size varies per
        flush, and each distinct leading dimension would be a fresh XLA
        compile (minutes over a remote tunnel). log2(max_batch) static
        shapes cover every load level. The clamp matters for
        non-power-of-two max_batch (e.g. 24): the batcher never collects
        more than max_batch, so rounding 17-24 up to 32 would hit a shape
        no warmup covered (ADVICE r4)."""
        b = 1
        while b < n:
            b *= 2
        return min(b, self.batcher.max_batch)

    def bucket_sizes(self) -> list[int]:
        """Every leading dimension _predict_batch can produce — the warmup
        set (powers of two up to max_batch, plus max_batch itself when it
        is not a power of two)."""
        sizes = []
        b = 1
        while b < self.batcher.max_batch:
            sizes.append(b)
            b *= 2
        sizes.append(self.batcher.max_batch)
        return sizes

    def _predict_batch(self, texts: list[str]) -> list[dict]:
        L = self.cfg.max_len
        B = self._bucket(len(texts))
        ids = np.full((B, L), self.tokenizer.pad_id, np.int32)
        word_idx = np.full((B, L), -1, np.int32)
        words_per = []
        for i, text in enumerate(texts):
            words = text.split()
            words_per.append(words)
            tok_ids, widx = self.tokenizer.encode_words(words)
            tok_ids, widx = tok_ids[:L], widx[:L]
            ids[i, : len(tok_ids)] = tok_ids
            word_idx[i, : len(widx)] = widx
        # padding rows keep one live token so attention never sees an
        # all-masked row; their outputs are sliced away below
        mask = ids != self.tokenizer.pad_id
        mask[:, 0] = True
        logits = np.asarray(self._fwd(self.params, jnp.asarray(ids), jnp.asarray(mask)))
        breaks = logits.argmax(-1) == 1  # [B, L]

        pros = None
        if self.prosody is not None:
            emb = np.asarray(
                self._embed(self.prosody["encoder_params"], jnp.asarray(ids), jnp.asarray(mask))
            )  # [B, hidden]
            z = np.asarray(self._regress(self.prosody["bilstm_params"], jnp.asarray(emb[:, None, :])))
            mu = np.asarray(self.prosody.get("mu", np.zeros(3)))
            sd = np.asarray(self.prosody.get("sd", np.ones(3)))
            pros = z * sd + mu  # [B, 3] → pitch, volume, rate percentages

        out = []
        for i, words in enumerate(words_per):
            # vectorized token→word break scatter (the per-token Python
            # loop was ~B·L interpreter iterations per flush)
            wb = np.zeros(len(words), bool)
            sel = (word_idx[i] >= 0) & breaks[i]
            wb[word_idx[i][sel]] = True
            word_break = wb.tolist()
            entry = {
                "words": words,
                "breaks": word_break,
            }
            p = tuple(pros[i]) if pros is not None else None
            if p is not None:
                entry["prosody"] = {
                    "pitch": f"{p[0]:+.2f}%",
                    "volume": f"{p[1]:+.2f}%",
                    "rate": f"{p[2]:+.2f}%",
                }
            entry["ssml"] = self._to_ssml(words, word_break, p)
            out.append(entry)
        return out

    def _to_ssml(self, words: list[str], word_break: list[bool], pros=None) -> str:
        from ..utils.text import xml_escape

        parts = []
        for w, brk in zip(words, word_break):
            parts.append(xml_escape(w))
            if brk:
                parts.append(f'<break time="{self.break_ms}ms"/>')
        body = " ".join(parts)
        if pros is not None:
            body = (
                f'<prosody pitch="{pros[0]:+.2f}%" rate="{pros[2]:+.2f}%" '
                f'volume="{pros[1]:+.2f}%">{body}</prosody>'
            )
        return (
            '<speak xmlns="http://www.w3.org/2001/10/synthesis" version="1.0" '
            f'xml:lang="fr-FR"><voice name="{self.voice}">{body}</voice></speak>'
        )

    def predict(self, text: str) -> dict:
        return self.batcher.submit(text)

    # -- HTTP -------------------------------------------------------------
    def make_handler(self):
        svc = self

        class Handler(BaseHTTPRequestHandler):
            # Serving-latency essentials (the r4 bench's 43 ms p50 /
            # 1.1 s p99 were BOTH transport artifacts, reproduced on CPU):
            # - HTTP/1.1 keep-alive: the 1.0 default closes the connection
            #   after every response, so each request pays a TCP handshake;
            #   a dropped SYN under concurrent load retransmits after ~1 s
            #   — the entire p99.
            # - Nagle off + single-write responses: headers and body written
            #   as separate segments stall ~40 ms on delayed ACK — the
            #   entire p50 on a sub-ms model.
            protocol_version = "HTTP/1.1"
            disable_nagle_algorithm = True

            def log_message(self, fmt, *args):
                log.debug(fmt, *args)

            def _json(self, obj, code=200):
                body = json.dumps(obj, ensure_ascii=False).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                if self.path == "/healthz":
                    return self._json({"status": "ok"})
                return self._json({"error": "unknown route"}, 404)

            def do_POST(self):  # noqa: N802
                if self.path != "/ssml":
                    return self._json({"error": "unknown route"}, 404)
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError):
                    return self._json({"error": "invalid JSON"}, 400)
                if "text" in req:
                    return self._json(svc.predict(str(req["text"])))
                if "texts" in req and isinstance(req["texts"], list):
                    return self._json([svc.predict(str(t)) for t in req["texts"]])
                return self._json({"error": "expected 'text' or 'texts'"}, 400)

        return Handler

    def serve(self, port: int = 8090) -> ThreadingHTTPServer:
        # socketserver's default listen backlog of 5 resets connections
        # when more clients connect at once than accept() keeps up with
        class _Server(ThreadingHTTPServer):
            request_queue_size = 128

        httpd = _Server(("0.0.0.0", port), self.make_handler())
        th = threading.Thread(target=httpd.serve_forever, daemon=True)
        th.start()
        log.info("SSML prediction service on :%d", httpd.server_address[1])
        return httpd
