"""Tests for training/eval harnesses, AB-test builder, viz endpoints."""

import json

import numpy as np
import pytest

from prosody_control_french_tts_tpu.models.tokenizer import WordPieceTokenizer
from prosody_control_french_tts_tpu.utils import wavio

SR = 22050


def make_bdd(n_segments=6, words_per=8, break_every=3, seed=0):
    """Synthetic bdd.json-shaped dict with known break structure."""
    rng = np.random.default_rng(seed)
    vocab = ["bonjour", "monde", "voix", "parle", "bien", "fort", "doux", "vite",
             "chat", "chien", "maison", "rouge", "vert", "bleu", "grand", "petit"]
    seq = []
    for s in range(n_segments):
        for w in range(words_per):
            text = " ".join(rng.choice(vocab, size=3)) + ("." if w % 4 == 3 else "")
            seq.append({
                "segment": f"segment_ph{s+1}",
                "type": "text",
                "text": text,
                "prosody": {
                    "pitch": f"{rng.normal(0, 1):+.2f}%",
                    "rate": f"{rng.normal(0, 2):+.2f}%",
                    "volume": f"{rng.normal(0, 3):+.2f}%",
                },
            })
            if w % break_every == break_every - 1:
                seq.append({"segment": f"segment_ph{s+1}", "type": "break", "time": "250ms"})
    return {"voice1": {"x": "", "y": {"parsed_sequence": seq, "stripped_ssml": {}, "raw_ssml": {}}}}


@pytest.fixture(scope="module")
def bdd():
    return make_bdd()


@pytest.fixture(scope="module")
def tok(bdd):
    from prosody_control_french_tts_tpu.models.datasets import iter_voice_entries, sequence_to_prosody_rows

    texts = [r["text"] for _, s in iter_voice_entries(bdd) for r in sequence_to_prosody_rows(s)]
    return WordPieceTokenizer.train(texts, vocab_size=400, min_freq=1)


class TestBreakTrainer:
    def test_bootstrap_runs(self, bdd, tok):
        from prosody_control_french_tts_tpu.models.bert import BertConfig
        from prosody_control_french_tts_tpu.models.break_trainer import bootstrap_runs

        cfg = BertConfig(vocab_size=len(tok), hidden=64, layers=1, heads=2, ffn=128, max_len=64)
        rep = bootstrap_runs(bdd, tok, cfg, runs=2, epochs=3)
        assert len(rep["runs"]) == 2
        assert 0.0 <= rep["f1"]["mean"] <= 1.0
        assert rep["perplexity"]["mean"] > 0
        assert rep["best_params"] is not None

    def test_inference_throughput_metric(self, bdd, tok):
        from prosody_control_french_tts_tpu.models.bert import BertConfig, BreakTagger
        from prosody_control_french_tts_tpu.models.break_trainer import sentences_per_second
        from prosody_control_french_tts_tpu.models.datasets import build_break_dataset
        import jax, jax.numpy as jnp

        cfg = BertConfig(vocab_size=len(tok), hidden=64, layers=1, heads=2, ffn=128, max_len=64)
        ds = build_break_dataset(bdd, tok, max_len=64)
        model = BreakTagger(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(ds.ids[:1]), jnp.asarray(ds.mask[:1]))
        sps = sentences_per_second(model, params, ds, batch_size=32, iters=3)
        assert sps > 0


class TestBiLSTMRunner:
    def test_train_and_evaluate(self, bdd, tok):
        from prosody_control_french_tts_tpu.models.bilstm_runner import train_and_evaluate

        rep = train_and_evaluate(bdd, seq_len=2, seed=0, tokenizer=tok, epochs=5)
        assert rep.z_mse >= 0 and rep.n_test > 0
        assert set(rep.raw_mae) == {"pitch", "volume", "rate"}


class TestLLMEval:
    def test_stage_a_metrics(self):
        from prosody_control_french_tts_tpu.models.llm_eval import evaluate_stage_a

        refs = ["un deux <break/> trois", "quatre cinq"]
        preds = ["un deux <break/> trois", "quatre <break/> cinq"]
        m = evaluate_stage_a(preds, refs)
        assert m.exact_match == 0.5
        assert m.break_recall == 1.0 and m.break_precision == 0.5

    def test_stage_b_metrics(self):
        from prosody_control_french_tts_tpu.models.llm_eval import evaluate_stage_b, extract_ssml_parameters

        gold = '<prosody pitch="+1.00%" rate="-2.00%" volume="+0.00%">a</prosody><break time="300ms"/>'
        pred = '<prosody pitch="+2.00%" rate="-2.00%" volume="+0.00%">a</prosody><break time="200ms"/>'
        p = extract_ssml_parameters(gold)
        assert p["pitch"] == [1.0] and p["break_ms"] == [300.0]
        m = evaluate_stage_b([pred], [gold])
        assert m.raw["pitch"]["mae"] == 1.0
        assert m.raw["break_ms"]["mae"] == 100.0
        assert m.matched == 1

    def test_teacher_forced_ppl(self):
        import jax, jax.numpy as jnp
        from prosody_control_french_tts_tpu.models.llm import DecoderLM, LLMConfig
        from prosody_control_french_tts_tpu.models.llm_eval import teacher_forced_perplexity

        cfg = LLMConfig.tiny()
        model = DecoderLM(cfg)
        prompt = jnp.asarray([1, 2, 3], jnp.int32)
        target = jnp.asarray([4, 5], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), jnp.concatenate([prompt, target])[None])
        ppl = teacher_forced_perplexity(model, params, prompt, target)
        assert ppl > 1.0


class TestReportHTML:
    def test_write(self, tmp_path):
        from prosody_control_french_tts_tpu.models.report_html import write_comparison_html

        res = {
            "modelA": {"break_f1": 0.8, "break_precision": 0.9, "break_recall": 0.7,
                        "tags_per_sentence": 3.0, "parse_failures": 0, "n": 10,
                        "mae": {"pitch": 1.0, "rate": 2.0, "volume": 3.0},
                        "r2": {"pitch": 0.5, "rate": 0.4, "volume": 0.3}},
        }
        p = write_comparison_html(res, tmp_path / "cmp.html",
                                  samples={"modelA": [{"id": "s1", "gold": "<g/>", "pred": "<p/>"}]})
        html = p.read_text()
        assert "modelA" in html and "0.800" in html and "&lt;g/&gt;" in html


class TestABTest:
    def test_build_chunks_logic(self):
        from prosody_control_french_tts_tpu.eval.abtest import build_chunks

        segs = [f"segment_ph{i}" for i in range(1, 8)]
        durs = {s: 20.0 for s in segs}
        durs["segment_ph1"] = 60.0  # single within bounds
        chunks = build_chunks(segs, durs, target=60, margin=15)
        assert chunks[0].segments == ["segment_ph1"]
        # remaining 6×20s → groups of 3 (60s)
        assert all(len(c.segments) == 3 for c in chunks[1:])

    def test_trim_logic(self):
        from prosody_control_french_tts_tpu.eval.abtest import build_chunks

        segs = ["segment_ph1", "segment_ph2"]
        durs = {"segment_ph1": 30.0, "segment_ph2": 80.0}
        chunks = build_chunks(segs, durs, target=60, margin=15)
        assert chunks and chunks[0].trim_last
        assert abs(chunks[0].trim_duration_s - 30.0) < 1e-9

    def test_export_pairs(self, tmp_path):
        from prosody_control_french_tts_tpu.eval.abtest import prepare_ab_test

        res = tmp_path / "results" / "v1" / "segmented_audio"
        raw = tmp_path / "data" / "v1_raw" / "audio"
        res.mkdir(parents=True)
        raw.mkdir(parents=True)
        for i in range(1, 4):
            x = np.random.default_rng(i).normal(size=SR * 25) * 0.1
            wavio.write_wav(res / f"segment_ph{i}.wav", x, SR)
            wavio.write_wav(raw / f"segment_ph{i}.wav", x * 0.5, SR)
        chunks = prepare_ab_test(tmp_path / "results", tmp_path / "data", tmp_path / "ab",
                                 num_pairs=5, target_duration_s=60, margin_s=15)
        assert chunks
        pair_dirs = list((tmp_path / "ab").iterdir())
        assert pair_dirs
        assert (pair_dirs[0] / "raw.wav").exists() and (pair_dirs[0] / "improved.wav").exists()


class TestAlignerHarness:
    def test_metrics(self):
        from prosody_control_french_tts_tpu.eval.aligner_harness import (
            WordInterval,
            evaluate_alignment,
        )

        gold = [WordInterval(0.0, 0.5, "bonjour"), WordInterval(0.6, 1.0, "monde."),
                WordInterval(1.2, 1.5, "salut"), WordInterval(1.6, 2.0, "amis.")]
        pred = [WordInterval(0.02, 0.52, "bonjour"), WordInterval(0.63, 1.05, "monde."),
                WordInterval(1.18, 1.52, "salut"), WordInterval(1.58, 2.02, "amis.")]
        rep = evaluate_alignment(pred, gold)
        e = rep["entire"]
        assert e.n_matched == 4
        assert e.start_err_mean < 0.05
        assert e.within_100ms == 1.0
        assert len(rep["sentences"]) == 2

    def test_audacity_roundtrip(self, tmp_path):
        from prosody_control_french_tts_tpu.eval.aligner_harness import (
            WordInterval,
            read_audacity_labels,
            write_audacity_labels,
        )

        words = [WordInterval(0.1, 0.4, "oui"), WordInterval(0.5, 0.9, "non")]
        write_audacity_labels(words, tmp_path / "l.txt")
        back = read_audacity_labels(tmp_path / "l.txt")
        assert [w.word for w in back] == ["oui", "non"]


class TestDatasetStats:
    def test_analyze(self, tmp_path, tok):
        from prosody_control_french_tts_tpu.eval.dataset_stats import analyze_dataset

        for v in ("a", "b"):
            for i in (1, 2):
                wavio.write_wav(tmp_path / f"{v}__segment_ph{i}.wav", np.zeros(SR), SR)
                (tmp_path / f"{v}__segment_ph{i}.txt").write_text("bonjour, le monde. oui !")
        stats = analyze_dataset(tmp_path, tokenizer=tok)
        assert stats["files"] == 4 and stats["speakers"] == 2
        assert abs(stats["audio_hours"] - 4 / 3600) < 1e-6
        assert stats["punctuation"][","] == 4
        assert stats["tokens"] > 0


class TestViz:
    def test_plot_data_and_server(self, tmp_path):
        import threading
        import urllib.request

        from prosody_control_french_tts_tpu.viz.plotdata import compute_plot_data
        from prosody_control_french_tts_tpu.viz.server import VizService, make_handler

        t = np.arange(SR) / SR
        x = 0.4 * np.sin(2 * np.pi * 220 * t)
        d = tmp_path / "nat"
        d.mkdir()
        wavio.write_wav(d / "segment_ph1.wav", x, SR)
        data = compute_plot_data(d / "segment_ph1.wav")
        assert data["sample_rate"] == SR
        hz = [v for v in data["f0"]["hz"] if v is not None]
        assert hz and abs(np.median(hz) - 220) < 2

        svc = VizService({"natural": d})
        from http.server import ThreadingHTTPServer

        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
        port = httpd.server_address[1]
        th = threading.Thread(target=httpd.serve_forever, daemon=True)
        th.start()
        try:
            segs = json.loads(urllib.request.urlopen(f"http://127.0.0.1:{port}/segments").read())
            assert segs == ["segment_ph1"]
            pd = json.loads(
                urllib.request.urlopen(f"http://127.0.0.1:{port}/plot_data/natural/segment_ph1").read()
            )
            assert pd["duration"] > 0.9
            wav = urllib.request.urlopen(f"http://127.0.0.1:{port}/audio/natural/segment_ph1").read()
            assert wav[:4] == b"RIFF"
        finally:
            httpd.shutdown()

    def test_acoustic_png(self, tmp_path):
        from prosody_control_french_tts_tpu.viz.acoustic import plot_comparison

        t = np.arange(SR) / SR
        wavio.write_wav(tmp_path / "a.wav", 0.4 * np.sin(2 * np.pi * 200 * t), SR)
        wavio.write_wav(tmp_path / "b.wav", 0.4 * np.sin(2 * np.pi * 260 * t), SR)
        p = plot_comparison(tmp_path / "a.wav", tmp_path / "b.wav", tmp_path / "cmp.png")
        assert p.exists() and p.stat().st_size > 10000


class TestCorpusCompare:
    def test_features_and_plots(self, tmp_path):
        from prosody_control_french_tts_tpu.eval.corpus_compare import compare_corpora, extract_features

        t = np.arange(SR) / SR
        for d, f in (("na", 200.0), ("sy", 240.0)):
            (tmp_path / d).mkdir()
            for i in range(2):
                wavio.write_wav(tmp_path / d / f"s{i}.wav", 0.4 * np.sin(2 * np.pi * f * t), SR)
        fa = extract_features(tmp_path / "na", cache=tmp_path / "ca.npz")
        fb = extract_features(tmp_path / "sy")
        assert abs(np.mean(fa["pitch_mean"]) - 200) < 4
        # cache hit path
        fa2 = extract_features(tmp_path / "na", cache=tmp_path / "ca.npz")
        np.testing.assert_array_equal(fa["pitch_mean"], fa2["pitch_mean"])
        pngs = compare_corpora(fa, fb, tmp_path / "plots")
        assert len(pngs) == 4 and all(p.exists() for p in pngs)


class TestABListening:
    def test_ab_page_and_response_logging(self, tmp_path):
        import threading
        import urllib.request
        from http.server import ThreadingHTTPServer

        from prosody_control_french_tts_tpu.viz.server import VizService, make_handler
        from prosody_control_french_tts_tpu.utils import wavio

        for kind in ("improved", "raw"):
            d = tmp_path / kind
            d.mkdir()
            wavio.write_wav(d / "0-pair.wav", np.zeros(4000), 8000)
        log_path = tmp_path / "ab.jsonl"
        svc = VizService({"improved": tmp_path / "improved", "raw": tmp_path / "raw"},
                         ab_log_path=log_path)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        try:
            html = urllib.request.urlopen(f"http://127.0.0.1:{port}/abtest").read().decode()
            assert "AB listening test" in html
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/ab_response",
                data=json.dumps({"segment": "0-pair", "order": ["raw", "improved"],
                                 "choice": 1, "chosen_kind": "improved"}).encode(),
                headers={"Content-Type": "application/json"},
            )
            out = json.loads(urllib.request.urlopen(req).read())
            assert out["status"] == "ok"
            rec = json.loads(log_path.read_text().splitlines()[0])
            assert rec["chosen_kind"] == "improved" and "t" in rec
        finally:
            httpd.shutdown()
