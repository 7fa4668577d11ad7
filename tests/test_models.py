"""Model-layer tests: tokenizer, BERT tagger, BiLSTM, LLM+LoRA, datasets,
few-shot harness, CTC alignment, multi-device sharding."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prosody_control_french_tts_tpu.models.tokenizer import WordPieceTokenizer
from prosody_control_french_tts_tpu.models.bert import BertConfig, BreakTagger, SentenceEncoder, cross_entropy_loss
from prosody_control_french_tts_tpu.models.bilstm import BiLSTMProsody, BiLSTMConfig, sliding_windows, train_bilstm, zscore_calibrate
from prosody_control_french_tts_tpu.models.llm import DecoderLM, LLMConfig, causal_lm_loss, greedy_generate
from prosody_control_french_tts_tpu.models.lora import lora_param_mask, merge_lora
from prosody_control_french_tts_tpu.models import datasets, fewshot
from prosody_control_french_tts_tpu.align.ctc import ctc_forced_align, ctc_loss, states_to_words

CORPUS = [
    "bonjour tout le monde nous parlons ensemble",
    "la voix naturelle change beaucoup aujourd'hui",
    "le chat dort sur le canapé rouge",
    "nous allons mesurer la prosodie de la parole",
    "c'est une belle journée pour parler français",
] * 4


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer.train(CORPUS, vocab_size=300, min_freq=1)


class TestTokenizer:
    def test_roundtrip_known_words(self, tok):
        ids = tok.encode("bonjour le monde")
        assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
        assert tok.decode(ids) == "bonjour le monde"

    def test_unknown_word(self, tok):
        ids, _ = tok.encode_words(["xylophone999±"])
        assert tok.unk_id in ids or len(ids) > 2  # pieces or UNK

    def test_first_subtoken_indices(self, tok):
        ids, widx = tok.encode_words(["bonjour", "monde"])
        firsts = [i for i in widx if i >= 0]
        assert firsts == [0, 1]

    def test_save_load(self, tok, tmp_path):
        tok.save(tmp_path / "v.json")
        t2 = WordPieceTokenizer.load(tmp_path / "v.json")
        assert t2.encode("bonjour le monde") == tok.encode("bonjour le monde")


class TestBert:
    def test_forward_and_loss(self, tok):
        cfg = BertConfig.tiny(vocab_size=len(tok))
        model = BreakTagger(cfg)
        ids = jnp.asarray([tok.encode("bonjour le monde")[: cfg.max_len]])
        ids = jnp.pad(ids, ((0, 0), (0, cfg.max_len - ids.shape[1])))
        mask = ids != tok.pad_id
        params = model.init(jax.random.PRNGKey(0), ids, mask)
        logits = model.apply(params, ids, mask)
        assert logits.shape == (1, cfg.max_len, 2)
        labels = jnp.where(mask, 0, -100).astype(jnp.int32)
        loss = cross_entropy_loss(logits, labels, mask)
        assert np.isfinite(float(loss))

    def test_training_reduces_loss(self, tok):
        cfg = BertConfig.tiny(vocab_size=len(tok))
        model = BreakTagger(cfg)
        rng = np.random.default_rng(0)
        ids = np.full((16, 32), tok.pad_id, np.int32)
        labels = np.full((16, 32), -100, np.int32)
        for i in range(16):
            n = rng.integers(8, 20)
            ids[i, :n] = rng.integers(5, len(tok), n)
            labels[i, :n] = (ids[i, :n] % 7 == 0).astype(np.int32)
        mask = ids != tok.pad_id
        cfg = BertConfig.tiny(vocab_size=len(tok))
        import optax

        params = model.init(jax.random.PRNGKey(1), jnp.asarray(ids)[:, : cfg.max_len], jnp.asarray(mask))
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def step(p, o, ids, mask, labels):
            def lf(p):
                return cross_entropy_loss(model.apply(p, ids, mask, deterministic=True), labels, mask)

            l, g = jax.value_and_grad(lf)(p)
            u, o = tx.update(g, o)
            return optax.apply_updates(p, u), o, l

        ids_j, mask_j, labels_j = jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels)
        first = None
        for i in range(30):
            params, opt, loss = step(params, opt, ids_j, mask_j, labels_j)
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.7

    def test_sentence_encoder_normalized(self, tok):
        cfg = BertConfig.tiny(vocab_size=len(tok))
        enc = SentenceEncoder(cfg)
        ids = jnp.asarray([[tok.cls_id, 7, 8, 9, tok.sep_id] + [tok.pad_id] * 11])
        mask = ids != tok.pad_id
        params = enc.init(jax.random.PRNGKey(0), ids, mask)
        v = enc.apply(params, ids, mask)
        assert abs(float(jnp.linalg.norm(v[0])) - 1.0) < 1e-4

    def test_sentence_encoder_transformer_contract(self, tok):
        """Contract invariants shared with the reference's downloaded
        all-mpnet-base-v2 (bilstm.py:12-13), the properties the BiLSTM
        consumer depends on — the hermetic substitution must honor them
        even though absolute embedding values necessarily differ:
        padding-invariance of the pooled vector, determinism, word-order
        sensitivity, and content discrimination."""
        cfg = BertConfig.tiny(vocab_size=len(tok))
        enc = SentenceEncoder(cfg)
        base = [tok.cls_id, 7, 8, 9, tok.sep_id]
        ids_a = jnp.asarray([base + [tok.pad_id] * 11])
        ids_b = jnp.asarray([base + [tok.pad_id] * 27])  # more padding
        params = enc.init(jax.random.PRNGKey(0), ids_a, ids_a != tok.pad_id)
        va = enc.apply(params, ids_a, ids_a != tok.pad_id)
        vb = enc.apply(params, ids_b, ids_b != tok.pad_id)
        assert float(jnp.max(jnp.abs(va - vb))) < 1e-4, "padding must not leak"
        # determinism
        va2 = enc.apply(params, ids_a, ids_a != tok.pad_id)
        assert float(jnp.max(jnp.abs(va - va2))) == 0.0
        # word order changes the embedding (positional encoding active)
        ids_sw = jnp.asarray([[tok.cls_id, 9, 8, 7, tok.sep_id] + [tok.pad_id] * 11])
        vsw = enc.apply(params, ids_sw, ids_sw != tok.pad_id)
        assert float(jnp.dot(va[0], vsw[0])) < 0.999
        # different content is further away than identical content
        ids_c = jnp.asarray([[tok.cls_id, 11, 12, 13, tok.sep_id] + [tok.pad_id] * 11])
        vc = enc.apply(params, ids_c, ids_c != tok.pad_id)
        assert float(jnp.dot(va[0], vc[0])) < 1.0 - 1e-4


class TestBiLSTM:
    def test_shapes(self):
        model = BiLSTMProsody(BiLSTMConfig(embed_dim=16))
        x = jnp.zeros((4, 3, 16))
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (4, 3)

    def test_windows(self):
        emb = np.arange(20, dtype=np.float32).reshape(10, 2)
        tgt = np.arange(30, dtype=np.float32).reshape(10, 3)
        xs, ys = sliding_windows(emb, tgt, 3)
        assert xs.shape == (8, 3, 2) and ys.shape == (8, 3)
        np.testing.assert_array_equal(xs[0], emb[:3])
        np.testing.assert_array_equal(ys[0], tgt[2])

    def test_learns_identity(self):
        rng = np.random.default_rng(0)
        emb = rng.normal(size=(80, 8)).astype(np.float32)
        tgt = emb[:, :3] * 2.0
        xs, ys = sliding_windows(emb, tgt, 2)
        params, hist = train_bilstm(xs, ys, epochs=40, batch_size=16)
        assert hist[-1] < hist[0]

    def test_zscore_roundtrip(self):
        v = np.array([[1.0, 2.0, 3.0], [3.0, 6.0, 9.0]])
        z, (mu, sd) = zscore_calibrate(v)
        np.testing.assert_allclose(z * sd + mu, v)


class TestLLM:
    def test_forward_and_loss(self):
        cfg = LLMConfig.tiny()
        model = DecoderLM(cfg)
        ids = jnp.asarray(np.random.default_rng(0).integers(1, cfg.vocab_size, (2, 16)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        logits = model.apply(params, ids)
        assert logits.shape == (2, 16, cfg.vocab_size)
        loss = causal_lm_loss(logits, ids, jnp.ones_like(ids, jnp.float32))
        assert np.isfinite(float(loss)) and float(loss) > 0

    def test_causality(self):
        cfg = LLMConfig.tiny()
        model = DecoderLM(cfg)
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, 12)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        base = model.apply(params, ids)
        ids2 = ids.at[0, -1].set((ids[0, -1] + 1) % cfg.vocab_size)
        pert = model.apply(params, ids2)
        # all positions before the change are unaffected
        np.testing.assert_allclose(np.asarray(base)[:, :-1], np.asarray(pert)[:, :-1], rtol=2e-2, atol=2e-3)

    def test_generate_matches_no_cache(self):
        cfg = LLMConfig.tiny()
        model = DecoderLM(cfg)
        rng = np.random.default_rng(2)
        prompt = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, 8)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), prompt)
        toks = np.asarray(greedy_generate(model, params, prompt, max_new=5))
        # uncached argmax chain must agree
        cur = prompt
        for t in range(5):
            logits = model.apply(params, cur)
            nxt = int(jnp.argmax(logits[0, -1]))
            assert nxt == int(toks[0, 8 + t])
            cur = jnp.concatenate([cur, jnp.asarray([[nxt]], jnp.int32)], axis=1)

    def test_lora_mask_and_training(self):
        from prosody_control_french_tts_tpu.models.training import init_train, make_train_step

        cfg = LLMConfig.tiny()
        model, tx, state = init_train(cfg, lr=1e-2, accum=1)
        mask = lora_param_mask(state.params)
        n_lora = sum(bool(m) for m in jax.tree.leaves(mask))
        assert n_lora == cfg.layers * 7 * 2  # q,k,v,o,gate,up,down × (A,B)
        step = make_train_step(model, tx, donate=False, trainable=state.mask)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 16)), jnp.int32)
        lm = jnp.ones_like(ids, jnp.float32)
        p0 = state.params
        p1, _, loss = step(p0, state.opt_state, ids, lm)
        # base kernels unchanged; at least one adapter B moved
        k0 = p0["params"]["layer_0"]["attn"]["q"]["kernel"]
        k1 = p1["params"]["layer_0"]["attn"]["q"]["kernel"]
        np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
        b0 = p0["params"]["layer_0"]["attn"]["q"]["lora_b"]
        b1 = p1["params"]["layer_0"]["attn"]["q"]["lora_b"]
        assert not np.allclose(np.asarray(b0), np.asarray(b1))

    def test_scanned_steps_match_sequential(self):
        """make_train_step(scan_steps=N) — N optimizer steps in one
        lax.scan launch — must walk the same trajectory as N sequential
        step calls (same batches, same order)."""
        from prosody_control_french_tts_tpu.models.training import init_train, make_train_step

        cfg = LLMConfig.tiny()
        model, tx, state = init_train(cfg, lr=1e-2, accum=1)
        step = make_train_step(model, tx, donate=False, trainable=state.mask)
        multi = make_train_step(model, tx, donate=False, trainable=state.mask, scan_steps=3)
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (3, 2, 16)), jnp.int32)
        lm = jnp.ones((2, 16), jnp.float32)
        p_seq, o_seq = state.params, state.opt_state
        seq_losses = []
        for k in range(3):
            p_seq, o_seq, loss = step(p_seq, o_seq, ids[k], lm)
            seq_losses.append(float(loss))
        p_scan, _, losses = multi(state.params, state.opt_state, ids, lm)
        np.testing.assert_allclose(np.asarray(losses), np.asarray(seq_losses), rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(p_seq), jax.tree.leaves(p_scan)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    def test_merge_lora_preserves_logits(self):
        cfg = LLMConfig.tiny()
        model = DecoderLM(cfg)
        ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        # nudge adapters so the merge is non-trivial
        params = jax.tree_util.tree_map_with_path(
            lambda p, x: x + 0.01 if any(getattr(k, "key", "") == "lora_b" for k in p) else x,
            params,
        )
        before = model.apply(params, ids)
        after = model.apply(merge_lora(params), ids)
        np.testing.assert_allclose(np.asarray(before), np.asarray(after), rtol=5e-2, atol=5e-2)


class TestSharding:
    def test_multichip_train_step(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_llm_param_spec_patterns(self):
        from prosody_control_french_tts_tpu.parallel.sharding import llm_param_spec
        from jax.sharding import PartitionSpec as P

        cfg = LLMConfig.tiny()
        model = DecoderLM(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
        specs = llm_param_spec(params)
        p = specs["params"]["layer_0"]["attn"]
        assert p["q"]["kernel"] == P(None, "model")
        assert p["o"]["kernel"] == P("model", None)
        assert specs["params"]["layer_0"]["mlp"]["down"]["kernel"] == P("model", None)
        assert specs["params"]["layer_0"]["attn"]["q"]["lora_a"] == P()


class TestCTC:
    def test_forced_align_recovers_segments(self):
        # emissions strongly favouring label sequence [1,1,2,2,2,3]
        T, V = 12, 5
        frame_labels = [1, 1, 0, 2, 2, 2, 0, 0, 3, 3, 0, 0]
        logp = np.full((T, V), -10.0, np.float32)
        for t, l in enumerate(frame_labels):
            logp[t, l] = 0.0
        labels = jnp.asarray([1, 2, 3])
        states, score = ctc_forced_align(jnp.asarray(logp), labels, jnp.int32(T), jnp.int32(3))
        words = states_to_words(np.asarray(states), [1, 2, 3], [(0, 1), (1, 2), (2, 3)], 0.1, ["a", "b", "c"])
        assert [w for _, _, w in words] == ["a", "b", "c"]
        spans = {w: (round(t0, 2), round(t1, 2)) for t0, t1, w in words}
        assert spans["a"][0] == 0.0 and spans["a"][1] <= 0.35
        assert spans["b"][0] >= 0.25 and spans["c"][0] >= 0.75

    def test_loss_decreases_on_matching(self):
        T, V = 10, 4
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(T, V)).astype(np.float32)
        logp = jax.nn.log_softmax(jnp.asarray(logits))
        labels = jnp.asarray([1, 2])
        l1 = float(ctc_loss(logp, labels, jnp.int32(T), jnp.int32(2)))
        # emissions aligned with the labels → lower loss
        good = np.full((T, V), -5.0, np.float32)
        good[:4, 1] = 0.0
        good[4:, 2] = 0.0
        l2 = float(ctc_loss(jax.nn.log_softmax(jnp.asarray(good)), labels, jnp.int32(T), jnp.int32(2)))
        assert l2 < l1


class TestDatasets:
    def _bdd(self):
        seq = [
            {"segment": "s1", "type": "text", "text": "bonjour le monde.",
             "prosody": {"pitch": "+1.00%", "rate": "-2.00%", "volume": "+0.50%"}},
            {"segment": "s1", "type": "break", "time": "300ms"},
            {"segment": "s1", "type": "text", "text": "la suite arrive.",
             "prosody": {"pitch": "-0.50%", "rate": "+1.00%", "volume": "-1.00%"}},
        ]
        return {
            "voice1": {
                "x": "bonjour le monde. la suite arrive.",
                "y": {
                    "parsed_sequence": seq,
                    "stripped_ssml": {
                        "s1": [
                            '<prosody pitch="+1.00%" rate="-2.00%" volume="+0.50%">bonjour le monde.</prosody>',
                            '<break time="300ms" />',
                        ]
                    },
                    "raw_ssml": {},
                },
            }
        }

    def test_break_words(self):
        words = datasets.sequence_to_break_words(self._bdd()["voice1"]["y"]["parsed_sequence"])
        assert words[2] == ("monde.", True)
        assert words[-1] == ("arrive.", False)

    def test_break_dataset(self, tok):
        ds = datasets.build_break_dataset(self._bdd(), tok, max_len=32)
        assert ds.ids.shape[0] == 2  # two sentences
        assert (ds.labels == 1).sum() == 1  # one BREAK

    def test_prosody_rows(self):
        rows = datasets.sequence_to_prosody_rows(self._bdd()["voice1"]["y"]["parsed_sequence"])
        assert rows[0]["pitch"] == 1.0 and rows[1]["rate"] == 1.0

    def test_qwen_a_pairs(self):
        pairs = datasets.qwen_a_pairs(self._bdd())
        assert pairs and "<break/>" in pairs[0]["y"] and "<break/>" not in pairs[0]["x"]

    def test_qwen_b_triples(self):
        tri = datasets.qwen_b_triples(self._bdd())
        assert tri and "_%" in tri[0]["z"] and "_ms" in tri[0]["z"]
        assert "+1.00%" in tri[0]["y"]

    def test_qwen_b_reference_format_exact(self):
        """y/z byte-identical to the reference's pretty-printed layout
        (data_formatting_QwenB.py:115-295): 2-space prosody blocks with
        4-space text lines, break groups on one line, a blank line between
        a break group and a following prosody, leading space; z always
        carries all three '_%' placeholders and '<break time=\"_ms\"/>'."""
        tri = datasets.qwen_b_triples(self._bdd())
        assert len(tri) == 1
        t = tri[0]
        assert t["x"] == "bonjour le monde.<break/>la suite arrive."
        assert t["y"] == (
            '   <prosody pitch="+1.00%" rate="-2.00%" volume="+0.50%">\n'
            "    bonjour le monde.\n"
            "  </prosody>\n"
            '  <break time="300ms"/>\n'
            "\n"
            '  <prosody pitch="-0.50%" rate="+1.00%" volume="-1.00%">\n'
            "    la suite arrive.\n"
            "  </prosody>"
        )
        assert t["z"] == (
            '   <prosody pitch="_%" rate="_%" volume="_%">\n'
            "    bonjour le monde.\n"
            "  </prosody>\n"
            '  <break time="_ms"/>\n'
            "\n"
            '  <prosody pitch="_%" rate="_%" volume="_%">\n'
            "    la suite arrive.\n"
            "  </prosody>"
        )

    def test_qwen_b_skips_breakless_segments(self):
        bdd = self._bdd()
        bdd["voice1"]["y"]["parsed_sequence"] = [
            {"segment": "s2", "type": "text", "text": "sans pause.",
             "prosody": {"pitch": "+0.00%", "rate": "+0.00%", "volume": "+0.00%"}},
        ]
        assert datasets.qwen_b_triples(bdd) == []

    def test_split(self):
        s = datasets.split_80_10_10(list(range(100)))
        assert len(s["train"]) == 80 and len(s["val"]) == 10 and len(s["test"]) == 10
        assert not (set(s["train"]) & set(s["test"]))

    def test_chunking(self):
        text = " ".join(["mot"] * 90 + ["fin."] + ["mot"] * 50 + ["stop."])
        chunks = datasets.chunk_at_sentences(text, max_words=100)
        assert len(chunks) == 2
        assert chunks[0].endswith("fin.")


class TestFewshot:
    def test_parse_repair(self):
        assert fewshot.parse_json_response('[{"a":1}]') == [{"a": 1}]
        assert fewshot.parse_json_response('noise [{"a":1}] more') == [{"a": 1}]
        assert fewshot.parse_json_response('```json\n[{"a":1}]\n```') == [{"a": 1}]
        got = fewshot.parse_json_response('x {"a":1} y {"b":2}')
        assert {"a": 1} in got and {"b": 2} in got

    def test_stub_experiment_perfect(self):
        samples = [
            {"segments": [
                {"text": "bonjour", "pitch": "+0.00%", "rate": "+0.00%", "volume": "+0.00%", "break_after_ms": 0},
                {"text": "monde", "pitch": "+0.00%", "rate": "+0.00%", "volume": "+0.00%", "break_after_ms": 0},
            ]}
        ] * 4
        res, preds = fewshot.run_experiment(fewshot.StubLLM(noise=0.0), samples, parallel_requests=2)
        assert res.parse_failures == 0
        assert res.mae["pitch"] == 0.0

    def test_ssml_builder(self):
        ssml = fewshot.predictions_to_ssml(
            [{"text": "salut", "pitch": "+1.00%", "rate": "-1.00%", "volume": "+0.00%", "break_after_ms": 250}]
        )
        assert '<break time="250ms"/>' in ssml and 'pitch="+1.00%"' in ssml

    def test_samples_from_bdd(self):
        bdd = TestDatasets()._bdd()
        samples = fewshot.samples_from_bdd(bdd)
        assert samples and samples[0]["segments"][0]["break_after_ms"] == 300
