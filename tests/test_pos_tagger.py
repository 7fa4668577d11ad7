"""Contextual French POS tagger (models/pos_tagger.py): packaged-checkpoint
accuracy on held-out silver data, contextual disambiguation the lexicon
cannot express, and downstream comma/pause-filter drift — VERDICT r3 item 8
(the spaCy fr_core_news_sm replacement, Code/audioPipeline.py:26-27)."""

import numpy as np
import pytest

from prosody_control_french_tts_tpu.models.pos_data import (
    FORBIDDEN_TAGS,
    generate_treebank,
)
from prosody_control_french_tts_tpu.models.pos_tagger import (
    PACKAGED_WEIGHTS,
    ContextualTagger,
    get_pos_backend,
    load_tagger,
    tokenize_with_elisions,
)
from prosody_control_french_tts_tpu.utils import fr_pos


@pytest.fixture(scope="module")
def tagger():
    assert PACKAGED_WEIGHTS.exists(), "packaged pos_fr.npz missing"
    return ContextualTagger(*load_tagger())


class TestPackagedAccuracy:
    @pytest.fixture(scope="class")
    def held_out_stats(self, tagger):
        held = generate_treebank(800, seed=99, holdout_fillers=True)
        tot = ok = amb_tot = amb_ok = fb_ok = lex_fb_ok = 0
        amb = {
            "a", "son", "or", "car", "personne", "tout", "toute", "tous",
            "si", "soit", "avant", "apres", "après", "pendant", "devant",
            "vers", "entre", "bien", "ete", "été", "pas", "leur", "en",
            "le", "la", "les", "que", "comme", "est",
        }
        for s in held:
            pred = tagger.tag_tokens(list(s.words))
            for w, gold, p in zip(s.words, s.tags, pred):
                tot += 1
                ok += p == gold
                if w.lower() in amb:
                    amb_tot += 1
                    amb_ok += p == gold
                gold_fb = gold in FORBIDDEN_TAGS
                fb_ok += (p in FORBIDDEN_TAGS) == gold_fb
                lex_fb_ok += fr_pos.is_function_word(w) == gold_fb
        return {
            "token_acc": ok / tot,
            "amb_acc": amb_ok / amb_tot,
            "fb_acc": fb_ok / tot,
            "lex_fb_acc": lex_fb_ok / tot,
        }

    def test_token_accuracy(self, held_out_stats):
        # held-out slot fillers — generalisation, not memorisation. The
        # residual errors are open-class/open-class confusions (NOUN vs ADJ
        # on never-seen fillers), which the forbidden-bit metric below shows
        # are immaterial to the pipeline's pause/comma decisions.
        assert held_out_stats["token_acc"] > 0.88, held_out_stats

    def test_ambiguous_form_accuracy(self, held_out_stats):
        assert held_out_stats["amb_acc"] > 0.95, held_out_stats

    def test_beats_lexicon_on_forbidden_bit(self, held_out_stats):
        # the pipeline consumes exactly this bit; the contextual tagger must
        # strictly beat the per-token lexicon on it
        assert held_out_stats["fb_acc"] > held_out_stats["lex_fb_acc"], held_out_stats
        assert held_out_stats["fb_acc"] > 0.98, held_out_stats


class TestContextualDisambiguation:
    """Minimal pairs the per-token lexicon provably gets half-wrong."""

    CASES = [
        # (sentence, token index after elision split, expected tag)
        ("il a mangé le gâteau", 1, "AUX"),
        ("le train arrive a paris", 3, "ADP"),
        ("son violon sonne doucement", 0, "DET"),
        ("le son de la cloche est clair", 1, "NOUN"),
        ("or , il pleut", 0, "CCONJ"),
        ("l' or brille vraiment", 1, "NOUN"),
        ("il reste car il pleut", 2, "CCONJ"),
        ("le car est parti", 1, "NOUN"),
        ("personne ne répond", 0, "PRON"),
        ("cette personne est calme", 1, "NOUN"),
        ("tout le monde chante", 0, "DET"),
        ("il marche tout doucement", 2, "ADV"),
        ("si tu viens , je chante", 0, "SCONJ"),
        ("le chemin est si long", 3, "ADV"),
        ("il faut qu' il soit là", 4, "AUX"),
        ("soit le piano soit le violon", 0, "CCONJ"),
        ("elle fait un pas vers la porte", 3, "NOUN"),
        ("il ne dort pas", 3, "ADV"),
        ("leur maison est grande", 0, "DET"),
        ("il leur parle souvent", 1, "PRON"),
    ]

    @pytest.mark.parametrize("sentence,idx,want", CASES)
    def test_minimal_pair(self, tagger, sentence, idx, want):
        toks = tokenize_with_elisions(sentence)
        tags = tagger.tag_tokens(toks)
        assert tags[idx] == want, list(zip(toks, tags))

    def test_lexicon_cannot_split_these(self):
        # sanity: the lexicon gives ONE answer per form, so at least one
        # reading of each pair is wrong by construction
        assert fr_pos.pos_tag("son") == fr_pos.pos_tag("son")
        assert fr_pos.is_function_word("personne")  # PRON reading hardwired
        assert fr_pos.is_function_word("car")  # CCONJ reading hardwired


class TestDownstreamDrift:
    """The numbers the VERDICT asked for: where and how often the comma /
    pause filters change decisions when POS becomes contextual."""

    def test_noun_comma_preserved(self, tagger):
        # lexicon tags "son" DET → drops the comma; contextual keeps it
        t = "le son , clair et net , résonne"
        assert fr_pos.remove_spurious_commas(t) != t
        assert tagger.remove_spurious_commas(t) == t

    def test_noun_comma_preserved_car(self, tagger):
        t = "le car , un vieux car bleu , arrive"
        assert tagger.remove_spurious_commas(t) == t
        assert fr_pos.remove_spurious_commas(t) != t

    def test_function_comma_still_dropped(self, tagger):
        t = "il pense que , demain viendra"
        assert tagger.remove_spurious_commas(t) == "il pense que demain viendra"
        assert fr_pos.remove_spurious_commas(t) == "il pense que demain viendra"

    def test_pause_filter_hook(self, tagger):
        from prosody_control_french_tts_tpu.ssml.syntagme import (
            filter_function_word_pauses,
        )

        # pause after NOUN "son" must survive under the contextual factory
        seq = [
            ("word", "le", 200),
            ("word", "son", 300),
            ("pause", None, 400),
            ("word", "résonne", 500),
        ]
        pos_of = tagger.make_pos_of([t for k, t, _ in seq if k == "word"])
        kept = filter_function_word_pauses(seq, pos_of)
        assert ("pause", None, 400) in kept
        # the same pause after DET "son" must be dropped
        seq2 = [
            ("word", "son", 300),
            ("pause", None, 400),
            ("word", "violon", 500),
            ("word", "sonne", 500),
        ]
        pos_of2 = tagger.make_pos_of([t for k, t, _ in seq2 if k == "word"])
        kept2 = filter_function_word_pauses(seq2, pos_of2)
        assert ("pause", None, 400) not in kept2
        # lexicon drops BOTH (its "son" is always DET)
        assert ("pause", None, 400) not in filter_function_word_pauses(seq)

    def test_real_sentence_golden(self, tagger):
        """VERDICT r4 #8: grade on REAL French sentences, not the silver
        template distribution. tests/goldens/fr_pos_sentences.json is a
        hand-curated sentence-level golden (UD-GSD conventions) at the
        token positions the pause/comma filters query. The HYBRID backend
        (contextual only on AMBIGUOUS_FORMS, lexicon elsewhere) must beat
        the lexicon alone and clear an absolute floor."""
        import json
        from pathlib import Path

        from prosody_control_french_tts_tpu.models.pos_tagger import (
            AMBIGUOUS_FORMS,
            _norm,
        )

        g = json.loads(
            (Path(__file__).parent / "goldens" / "fr_pos_sentences.json").read_text(
                encoding="utf-8"
            )
        )
        ok_l = ok_h = n = 0
        for e in g["sentences"]:
            toks = e["tokens"]
            ctags = tagger.tag_tokens(toks)
            for idx, gold in e["gold"].items():
                i = int(idx)
                n += 1
                lb = fr_pos.pos_tag(toks[i]) in fr_pos.FORBIDDEN
                if _norm(toks[i]) in AMBIGUOUS_FORMS:
                    hb = ctags[i] in FORBIDDEN_TAGS
                else:
                    hb = lb
                ok_l += lb == gold["forbidden"]
                ok_h += hb == gold["forbidden"]
        assert n >= 45
        acc_l, acc_h = ok_l / n, ok_h / n
        assert acc_h >= acc_l, (acc_h, acc_l)
        # packaged checkpoint grades 0.980 (sole miss: 'la' as the solfège
        # note — le/la/les stay lexicon-DET by design); floor with margin
        assert acc_h >= 0.92, acc_h

    def test_pause_filter_skips_unqueried_occurrences(self, tagger):
        # ADVICE r4 repro: only the word directly before a pause is queried,
        # so an earlier unqueried occurrence of the same token must NOT
        # consume the query. First "car" is CCONJ (never queried — no pause
        # follows it); second "car" is NOUN and precedes the pause: the
        # positional pointer must resolve the query to the SECOND occurrence
        # and keep the pause.
        from prosody_control_french_tts_tpu.ssml.syntagme import (
            filter_function_word_pauses,
        )

        seq = [
            ("word", "car", 200),  # CCONJ — unqueried
            ("word", "il", 150),
            ("word", "pleut", 250),
            ("word", "le", 150),
            ("word", "car", 300),  # NOUN — queried (precedes the pause)
            ("pause", None, 400),
            ("word", "arrive", 500),
        ]
        pos_of = tagger.make_pos_of([t for k, t, _ in seq if k == "word"])
        kept = filter_function_word_pauses(seq, pos_of)
        assert ("pause", None, 400) in kept

    def test_get_pos_backend(self):
        b = get_pos_backend("lexicon")
        assert b.first_token_pos is fr_pos.first_token_pos
        assert b.pos_of_factory is None
        with pytest.raises(ValueError):
            get_pos_backend("spacy")
