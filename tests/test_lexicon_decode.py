"""Lexicon-constrained decode (align.lexicon_decode) + the grammatical
Zipf sampler (align.synth_speech.sample_sentences_fr) + the ASR text
normalizer (eval.metrics.normalize_asr_text).

The reference's aligner inherits a trained French LM from its published
checkpoint (Code/Aligners/use_whisper_timestamped.py:92-104); the hermetic
rebuild gets its lexical prior from trie-constrained shallow fusion — these
tests pin the trie tables' semantics, the decode-loop contract (only real
words, no repetition babble) and the training-distribution statistics.
"""

from __future__ import annotations

import numpy as np
import pytest

from prosody_control_french_tts_tpu.align.lexicon_decode import (
    TrieTables,
    build_trie,
    default_trie,
    french_lexicon,
)
from prosody_control_french_tts_tpu.align.synth_speech import (
    sample_sentences_fr,
    sampler_vocabulary,
    unigram_priors,
)

SPACE = 0x20


def walk(trie: TrieTables, word: str) -> int:
    """Follow a word's bytes through the trie; -1 if it falls off."""
    cur = 0
    for b in word.encode("utf-8"):
        cur = int(trie.trans[cur, b])
        if cur < 0:
            return -1
    return cur


class TestTrie:
    def test_words_end_at_endable_nodes(self):
        t = build_trie(["le", "les", "chat"])
        for w in ("le", "les", "chat"):
            n = walk(t, w)
            assert n > 0 and t.can_end[n], w

    def test_prefix_of_word_not_endable(self):
        t = build_trie(["les"])
        n = walk(t, "le")
        assert n > 0 and not t.can_end[n]

    def test_non_word_falls_off(self):
        t = build_trie(["le", "chat"])
        assert walk(t, "chien") == -1

    def test_elision_splices_root(self):
        t = build_trie(["l'", "histoire"])
        n = walk(t, "l'")
        assert n > 0 and not t.can_end[n]
        # continuing through the splice spells a full word
        m = walk(t, "l'histoire")
        assert m > 0 and t.can_end[m]

    def test_elision_prefers_longer_in_trie_word(self):
        # "l'ami" is a literal vocab word AND l' + ami via the splice: the
        # literal path must survive the merge
        t = build_trie(["l'", "l'ami", "ami"])
        n = walk(t, "l'ami")
        assert n > 0 and t.can_end[n]

    def test_priors_zero_centred_bonus(self):
        t = build_trie(["le", "chat"], priors={"le": 0.5, "chat": 0.001})
        nl, nc = walk(t, "le"), walk(t, "chat")
        assert t.end_bonus[nl] > 0 > t.end_bonus[nc]

    def test_default_trie_covers_samplers(self):
        t = default_trie()
        vocab, priors = french_lexicon()
        # every sampler surface form is decodable
        for w in sampler_vocabulary():
            n = walk(t, w)
            assert n > 0, w
            assert t.can_end[n] or w.endswith("'"), w
        assert len(priors) > 100


class TestConstrainedGreedy:
    @pytest.fixture(scope="class")
    def aligner(self):
        from prosody_control_french_tts_tpu.align.whisper_jax import WhisperAligner

        al = WhisperAligner()
        if al.params is None:
            pytest.skip("no packaged whisper checkpoint")
        assert al.lexicon_decode
        return al

    def test_free_decode_emits_only_lexicon_words(self, aligner):
        from prosody_control_french_tts_tpu.utils.wavio import Audio

        # unseen real-ish audio: noise bursts shaped like speech cadence
        rng = np.random.default_rng(0)
        sr = 16000
        x = (0.1 * rng.standard_normal(6 * sr)).astype(np.float32)
        env = np.clip(np.sin(2 * np.pi * 2.7 * np.arange(6 * sr) / sr), 0, None)
        tg = aligner.align(Audio((x * env).astype(np.float32), sr))
        vocab = set(french_lexicon()[0])
        words = [iv.mark.strip() for iv in tg.tiers[0] if iv.mark.strip()]
        for w in words:
            if w == "...":  # the reference's silence placeholder
                continue
            assert _in_lexicon(w, vocab), w

    def test_no_repetition_babble(self, aligner):
        from prosody_control_french_tts_tpu.utils.wavio import Audio

        # pure tone: maximally OOD, the old decoder looped to the cap
        sr = 16000
        t = np.arange(5 * sr) / sr
        x = (0.2 * np.sin(2 * np.pi * 150 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(
            np.float32
        )
        tg = aligner.align(Audio(x, sr))
        words = [iv.mark.strip() for iv in tg.tiers[0] if iv.mark.strip()]
        for i in range(len(words) - 3):
            quad = words[i : i + 4]
            assert not (quad[0] == quad[1] == quad[2] == quad[3]), words
            assert not (
                quad[0] == quad[2] and quad[1] == quad[3] and quad[0] != quad[1] and i + 4 < len(words) and words[i + 4] == quad[0]
            ), words

    def test_synthetic_holdout_unharmed(self, aligner):
        """The lexicon constraint must not break in-domain transcription:
        training-vocabulary sentences still decode accurately."""
        from difflib import SequenceMatcher

        from prosody_control_french_tts_tpu.align.synth_speech import (
            sample_sentences,
            synth_sentence,
        )
        from prosody_control_french_tts_tpu.utils.wavio import Audio

        hit = tot = 0
        for i, sent in enumerate(sample_sentences(8, seed=913_000)):
            audio, gold = synth_sentence(sent, seed=913_000 + i)
            tg = aligner.align(Audio(audio, 16000))
            words = [iv.mark.strip() for iv in tg.tiers[0] if iv.mark.strip()]
            sm = SequenceMatcher(a=sent.split(), b=words, autojunk=False)
            hit += sum(b.size for b in sm.get_matching_blocks())
            tot += len(sent.split())
        assert hit / tot > 0.8, (hit, tot)


def _in_lexicon(word: str, vocab: set[str]) -> bool:
    if word in vocab:
        return True
    for apo in ("'",):
        if apo in word:
            pre, _, rest = word.partition(apo)
            if (pre + apo) in vocab and (rest in vocab or not rest):
                return True
    return False


class TestSampler:
    def test_closed_class_mass_realistic(self):
        pri = unigram_priors(n_sentences=1500, seed=5)
        func = set(
            "le la les un une des du ce cette ces son sa ses leur notre il elle ils "
            "elles nous vous on je de dans sur avec pour sous vers chez sans entre "
            "devant pendant depuis après avant et mais ou donc alors ensuite puis "
            "enfin est sont était étaient a ont avait avaient sera serait ne".split()
        )
        mass = sum(p for w, p in pri.items() if w in func)
        assert 0.35 < mass < 0.7, mass

    def test_le_la_dominate(self):
        pri = unigram_priors(n_sentences=1500, seed=6)
        top5 = [w for w, _ in sorted(pri.items(), key=lambda kv: -kv[1])[:5]]
        assert "le" in top5 and "la" in top5, top5

    def test_vocabulary_closed(self):
        vocab = set(sampler_vocabulary())
        for s in sample_sentences_fr(300, seed=7):
            for w in s.split():
                assert w in vocab, w

    def test_deterministic(self):
        assert sample_sentences_fr(20, seed=3) == sample_sentences_fr(20, seed=3)


class TestNormalizer:
    def test_whisper_basic_semantics(self):
        from prosody_control_french_tts_tpu.eval.metrics import normalize_asr_text

        assert normalize_asr_text("L'Émission, consacrée!") == "l emission consacree"
        assert normalize_asr_text("aujourd'hui") == "aujourd hui"
        assert normalize_asr_text("  déjà   vu ") == "deja vu"

    def test_wer_invariant_to_orthography(self):
        from prosody_control_french_tts_tpu.eval.metrics import normalize_asr_text, wer

        ref = normalize_asr_text("l'histoire de la musique")
        hyp = normalize_asr_text("L'HISTOIRE de là musique")
        assert wer(ref, hyp) == 0.0
