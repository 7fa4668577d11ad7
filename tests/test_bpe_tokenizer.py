"""Byte-level BPE tokenizer + Whisper vocabulary converter tests
(models/bpe_tokenizer.py — the out-of-the-box deployability path for
``aligner: whisper``, use_whisper_timestamped.py:92-104)."""

import base64
import json

import numpy as np
import pytest

from prosody_control_french_tts_tpu.models.bpe_tokenizer import (
    MULTILINGUAL_VOCAB,
    ByteLevelBPE,
    bytes_to_unicode,
    from_tiktoken,
    from_vocab_and_merges,
    gpt2_pretokenize,
    load_whisper_tokenizer,
    synthetic_multilingual,
    whisper_specials,
)


class TestSpecialsTable:
    def test_published_ids(self):
        sp = whisper_specials()
        assert sp["<|endoftext|>"] == 50257
        assert sp["<|startoftranscript|>"] == 50258
        assert sp["<|en|>"] == 50259
        assert sp["<|fr|>"] == 50265  # the pipeline's language
        assert sp["<|transcribe|>"] == 50359
        assert sp["<|notimestamps|>"] == 50363
        assert sp["<|0.00|>"] == 50364 and sp["<|30.00|>"] == 51864
        assert max(sp.values()) + 1 == MULTILINGUAL_VOCAB


class TestPretokenizer:
    def test_words_carry_leading_space(self):
        assert gpt2_pretokenize("Bonjour le monde!") == ["Bonjour", " le", " monde", "!"]

    def test_double_space(self):
        assert gpt2_pretokenize("  a") == [" ", " a"]

    def test_numbers_and_apostrophes(self):
        assert gpt2_pretokenize("c'est 123 ans") == ["c", "'", "est", " 123", " ans"]

    def test_trailing_whitespace(self):
        assert gpt2_pretokenize("a  ") == ["a", "  "]


class TestSyntheticMultilingual:
    def test_geometry(self):
        tok = synthetic_multilingual()
        assert len(tok) == MULTILINGUAL_VOCAB

    def test_roundtrip_accented_french(self):
        tok = synthetic_multilingual()
        text = "Bonjour, le monde élégant à Noël ! Ça va ?"
        ids = tok.encode(text)
        assert ids[0] == 50258 and ids[-1] == 50257  # sot … eot frame
        assert tok.decode(ids) == text

    def test_pieces_with_boundaries_lossless(self):
        tok = synthetic_multilingual()
        text = "très bien élevé"
        ids = tok.encode(text)[1:-1]
        pieces = tok.pieces_with_boundaries(ids)
        assert "".join(pieces) == text
        # word starts carry the leading space even across multi-byte chars
        starts = [p for p in pieces if p.startswith(" ")]
        assert len(starts) == 2  # "bien", "élevé" ("très" is BOS, no space)

    def test_sot_sequence(self):
        tok = synthetic_multilingual()
        assert tok.sot_sequence("fr") == [50258, 50265, 50359, 50363]


@pytest.fixture()
def mini_vocab_files(tmp_path):
    """A miniature GPT-2-format vocabulary: 256 byte tokens + a merge chain
    building ``Ġbon``."""
    b2u = bytes_to_unicode()
    sp = b2u[ord(" ")]
    v = {b2u[b]: b for b in range(256)}
    v[sp + "b"] = 256
    v[sp + "bo"] = 257
    v[sp + "bon"] = 258
    v["bo"] = 259
    v["on"] = 260
    (tmp_path / "vocab.json").write_text(json.dumps(v))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join([f"{sp} b", f"{sp}b o", f"{sp}bo n", "b o", "o n"])
    )
    return tmp_path, v, sp


class TestConverters:
    def test_vocab_and_merges(self, mini_vocab_files):
        d, v, sp = mini_vocab_files
        tok = from_vocab_and_merges(d / "vocab.json", d / "merges.txt")
        ids = tok.encode_text(" bon")
        inv = {i: t for t, i in tok.vocab.items()}
        assert [inv[i] for i in ids] == [sp + "bon"]
        assert tok.decode(ids) == "bon"

    def test_tiktoken_rank_file(self, mini_vocab_files):
        d, v, sp = mini_vocab_files
        byte_dec = {c: b for b, c in bytes_to_unicode().items()}
        lines = [
            base64.b64encode(bytes(byte_dec[c] for c in t)).decode() + " " + str(r)
            for t, r in sorted(v.items(), key=lambda kv: kv[1])
        ]
        (d / "mini.tiktoken").write_text("\n".join(lines))
        tok = from_tiktoken(d / "mini.tiktoken")
        ids = tok.encode_text(" bon")
        inv = {i: t for t, i in tok.vocab.items()}
        assert [inv[i] for i in ids] == [sp + "bon"]  # ranks drive the merges

    def test_directory_probe_and_save_load(self, mini_vocab_files):
        d, v, sp = mini_vocab_files
        tok = load_whisper_tokenizer(d)  # finds vocab.json + merges.txt
        ids = tok.encode_text(" bon")
        tok.save(d / "saved.bpe.json")
        tok2 = ByteLevelBPE.load(d / "saved.bpe.json")
        assert tok2.encode_text(" bon") == ids
        # directory probe prefers tokenizer.json > vocab.json > tiktoken > bpe.json
        tok3 = load_whisper_tokenizer(d / "saved.bpe.json")
        assert tok3.encode_text(" bon") == ids

    def test_hf_tokenizer_json(self, mini_vocab_files, tmp_path):
        d, v, sp = mini_vocab_files
        tj = {
            "model": {
                "vocab": v,
                "merges": [f"{sp} b", f"{sp}b o", f"{sp}bo n", "b o", "o n"],
            },
            "added_tokens": [
                {"content": "<|endoftext|>", "id": 261},
                {"content": "<|startoftranscript|>", "id": 262},
            ],
        }
        (tmp_path / "tokenizer.json").write_text(json.dumps(tj))
        tok = load_whisper_tokenizer(tmp_path / "tokenizer.json")
        assert tok.sep_id == 261 and tok.cls_id == 262
        ids = tok.encode(" bon")
        assert ids[0] == 262 and ids[-1] == 261
        assert tok.decode(ids) == "bon"


class TestAlignerProtocol:
    def test_full_geometry_ids_roundtrip_random_checkpoint(self):
        """VERDICT #2 done-criterion: a random-init checkpoint at the full
        51865-id vocabulary round-trips ids↔text and produces a TextGrid
        through the aligner (tiny dims keep the CPU cost test-sized; the
        vocab axis is the full published geometry)."""
        import jax
        import jax.numpy as jnp

        from prosody_control_french_tts_tpu.align.whisper_jax import (
            WhisperAligner,
            WhisperConfig,
        )
        from prosody_control_french_tts_tpu.utils.wavio import Audio

        tok = synthetic_multilingual()
        cfg = WhisperConfig.test(vocab_size=MULTILINGUAL_VOCAB)
        al = WhisperAligner(cfg, tokenizer=tok, use_vad=False, detect_disfluencies=False)
        al.params = al.model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 40, cfg.n_mels)),
            jnp.asarray([[1, 2]], jnp.int32),
        )
        sr = 16000
        t = np.arange(sr) / sr
        audio = Audio((0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
        text = "bonjour le monde"
        ids = tok.encode(text)
        assert tok.decode(ids) == text
        tg = al.align(audio, text)
        marks = [iv.mark for iv in tg.tiers[0] if iv.mark.strip()]
        assert set(marks) <= set(text.split()) and marks  # words, possibly merged spans
