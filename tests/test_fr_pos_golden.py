"""Golden-table validation of the closed-class French POS tagger
(VERDICT round-1 item 10: pin fr_pos behaviour against a curated
UD-French-GSD tag table, since spaCy is not installable here).

The downstream contract (Code/audioPipeline.py:27,451-465) only consumes
*function-word membership* — {DET,ADP,CCONJ,SCONJ,PART,PRON} vs everything
else — so the golden asserts that classification for ~120 function words
and ~100 content/adverb words from the pipeline's domain, plus exact tags
where the reading is unambiguous.
"""

from __future__ import annotations

import json
from pathlib import Path

from prosody_control_french_tts_tpu.utils import fr_pos

GOLDEN = json.loads(
    (Path(__file__).parent / "goldens" / "fr_pos_ud_gsd.json").read_text(encoding="utf-8")
)

# forms whose exact tag is reading-dependent (le/la/les DET|PRON, que
# SCONJ|PRON, en ADP|PRON, avant/après/pendant ADP|SCONJ-in-locution…);
# for these only the function-word bit is asserted
AMBIGUOUS = {
    "le", "la", "les", "leur", "que", "en", "ce", "si", "comme",
    "avant", "après", "pendant", "dès", "tout", "toute", "tous", "toutes",
    "aucun", "aucune", "quel", "quelle", "personne", "rien", "or",
}


class TestFunctionWords:
    def test_all_function_words_filtered(self):
        for word, tag in GOLDEN["function"].items():
            assert fr_pos.is_function_word(word), f"{word} (UD {tag}) must be a function word"

    def test_exact_tags_where_unambiguous(self):
        mismatches = [
            (w, want, fr_pos.pos_tag(w))
            for w, want in GOLDEN["function"].items()
            if w not in AMBIGUOUS and fr_pos.pos_tag(w) != want
        ]
        assert not mismatches, mismatches


class TestContentWords:
    def test_no_content_word_filtered(self):
        wrong = [w for w in GOLDEN["content"] if fr_pos.is_function_word(w)]
        assert not wrong, f"content words misclassified as function words: {wrong}"

    def test_ud_adverbs_not_suppressed(self):
        # UD French tags these ADV — a pause after "Eh bien," / "Puis," is
        # legitimate and spaCy-driven reference runs keep it
        for adv in ("bien", "puis", "sinon", "alors", "ensuite", "enfin"):
            assert fr_pos.pos_tag(adv) == "X", adv
            assert not fr_pos.is_function_word(adv), adv


class TestCommaFilterSemantics:
    def test_pause_kept_after_adverb(self):
        # regression for the bien/puis fix: commas after ADVs survive
        assert fr_pos.remove_spurious_commas("eh bien, nous y voilà") == "eh bien, nous y voilà"
        assert fr_pos.remove_spurious_commas("puis, il partit") == "puis, il partit"

    def test_comma_dropped_after_function_word(self):
        assert fr_pos.remove_spurious_commas("il pense que, demain viendra") == (
            "il pense que demain viendra"
        )
