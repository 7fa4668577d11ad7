"""Deterministic compositional speech synthesizer for aligner pretraining.

The reference's CTC-family aligners ship pretrained acoustic models
(MFA French dictionary+acoustic model, NeMo ``stt_fr_citrinet_1024``,
ctc-forced-aligner checkpoints — Code/Aligners/Use_MFA.py:50-53, NeMo.py,
CTCFA.py). This environment has no model downloads, so the out-of-the-box
``aligner: ctc`` checkpoint is pretrained on *synthetic speech from this
module*: every character of ``ctc_aligner.FR_CHARS`` maps to a distinct,
fixed spectral signature (two "formant" partials + character-dependent
noising), so audio built by concatenation is compositional — a model
trained on it generalises to unseen words and sentences, which is what the
held-out boundary-error gate in tests/test_ctc_pretrained.py checks.

Unlike ``tts.fake.FakeBackend`` (whose waveform depends on a text *hash*,
deliberately non-compositional so measurement tests can't overfit), this
synthesizer is invertible by design: char identity is recoverable from any
80 ms window, and gold word boundaries are returned exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from .ctc_aligner import FR_CHARS

VOWELS = set("aeiouyàâäéèêëîïôöùûüœ")

# Character-specific partial frequencies, golden-ratio-spread over the
# speech band so adjacent charset indices land far apart in frequency.
_PHI = 0.6180339887498949


def char_formants(c: str) -> tuple[float, float]:
    i = FR_CHARS.index(c)
    f1 = 280.0 + 2400.0 * ((i * _PHI) % 1.0)
    f2 = 900.0 + 4200.0 * ((i * _PHI * _PHI) % 1.0)
    return f1, f2


@dataclass
class SynthSpec:
    sample_rate: int = 16000
    vowel_s: float = 0.105
    consonant_s: float = 0.065
    space_s: float = 0.075
    edge_s: float = 0.04  # leading/trailing silence
    f0: float = 120.0  # voicing buzz under vowels
    noise: float = 0.015


def _char_wave(c: str, spec: SynthSpec, rng: np.random.Generator) -> np.ndarray:
    sr = spec.sample_rate
    if c == " ":
        return np.zeros(int(spec.space_s * sr), np.float32)
    dur = spec.vowel_s if c in VOWELS else spec.consonant_s
    n = int(dur * sr)
    t = np.arange(n) / sr
    f1, f2 = char_formants(c)
    sig = 0.55 * np.sin(2 * np.pi * f1 * t) + 0.35 * np.sin(2 * np.pi * f2 * t)
    if c in VOWELS:  # voicing buzz — vowels get harmonic low-band energy
        sig += 0.25 * np.sin(2 * np.pi * spec.f0 * t) + 0.12 * np.sin(4 * np.pi * spec.f0 * t)
    else:  # consonants get a touch of wide-band frication
        sig += 4.0 * spec.noise * rng.standard_normal(n)
    sig += spec.noise * rng.standard_normal(n)
    ramp = max(int(0.004 * sr), 1)
    env = np.ones(n)
    env[:ramp] = np.linspace(0, 1, ramp)
    env[-ramp:] *= np.linspace(1, 0, ramp)
    return (0.3 * sig * env).astype(np.float32)


def synth_sentence(
    text: str, spec: SynthSpec | None = None, seed: int = 0, with_chars: bool = False
):
    """text → (mono float32 audio, gold [(t0, t1, word)] spans in seconds).

    With ``with_chars=True`` additionally returns gold per-character spans
    [(t0, t1, char)] (inter-word gaps as ' ') — the frame-supervision
    targets for aligner pretraining. Characters outside FR_CHARS are
    dropped (matching CharVocab.encode); words that lose every character
    are skipped.
    """
    spec = spec or SynthSpec()
    sr = spec.sample_rate
    rng = np.random.default_rng(seed)
    pieces = [np.zeros(int(spec.edge_s * sr), np.float32)]
    t = spec.edge_s
    spans: list[tuple[float, float, str]] = []
    char_spans: list[tuple[float, float, str]] = []
    words = text.lower().split()
    for k, word in enumerate(words):
        kept = [c for c in word if c in FR_CHARS and c != " "]
        if not kept:
            continue
        if spans:  # inter-word gap
            gap = _char_wave(" ", spec, rng)
            pieces.append(gap)
            char_spans.append((t, t + gap.size / sr, " "))
            t += gap.size / sr
        t0 = t
        for c in kept:
            w = _char_wave(c, spec, rng)
            pieces.append(w)
            char_spans.append((t, t + w.size / sr, c))
            t += w.size / sr
        spans.append((t0, t, word))
    pieces.append(np.zeros(int(spec.edge_s * sr), np.float32))
    audio = np.concatenate(pieces)
    if with_chars:
        return audio, spans, char_spans
    return audio, spans


# ---------------------------------------------------------------------------
# sentence sampling for the pretraining corpus
# ---------------------------------------------------------------------------

# compact everyday-French vocabulary (all 46 FR_CHARS characters covered)
WORDS = (
    "le la les un une des et ou mais dans sur avec pour par que qui est "
    "sont était être avoir fait dit voit sait peut veut vient va prend "
    "bonjour merci voilà demain hier aujourd'hui toujours jamais encore "
    "maison ville rue monde pays temps jour nuit matin soir année siècle "
    "homme femme enfant ami frère sœur père mère famille gens "
    "musique chanson voix radio émission histoire œuvre portrait artiste "
    "grand petit beau jeune vieux nouveau premier dernier français "
    "parle écoute chante joue commence termine raconte explique montre "
    "très bien plus moins aussi ici là peut-être vraiment beaucoup "
    "eau feu ciel mer terre vent pluie neige été hiver printemps automne "
    "cœur tête main pied yeux nez goût août île forêt théâtre hôtel "
    "garçon leçon façon ça déjà près après très où dû sûr fût "
    "noël haïr maïs égoïste naïf aiguë exiguë "
    "kiwi wagon yoga pyjama zèbre jazz quiz box taxi examen "
    "l'ami d'abord qu'il c'est j'ai n'est s'il t'aime m'aime"
).split()


# Frequency-list French beyond the charset-coverage core: common
# content/function words (standard top-frequency vocabulary, not tied to
# any test text) so the byte decoder learns real French orthotactics —
# silent endings (-ent, -s, -x, -e), digraphs (ou/au/eau/ai/ei/oi/gn/ch),
# liaison-prone function words. Used by the narrator-domain (formant)
# pretraining mix; the core WORDS list alone taught a 150-word LM whose
# free decode produced French-shaped non-words on real audio (r04/r05
# agreement evidence).
WORDS_RICH = WORDS + (
    "de du au aux ce cette ces son sa ses mon ma mes ton ta tes notre votre "
    "il elle ils elles nous vous je tu on se ne pas plein chaque quelques "
    "tout tous toute toutes autre autres même mêmes tel telle quel quelle "
    "être été suis es sommes êtes serait sera seront était étaient "
    "avait avaient aura aurait ayant eu a ont avons avez "
    "faire fais faisait faisaient fera ferait faite faites "
    "dire disait disent dira dirait dit dits "
    "aller allait vont ira irait allé venir venait viennent viendra venu "
    "pouvoir pouvait peuvent pourra pourrait pu devoir devait doivent devra dû "
    "vouloir voulait veulent voudra voulu savoir savait savent saura su "
    "voir voyait voient verra vu prendre prenait prennent prendra pris "
    "donner donnait donnent donnera donné trouver trouvait trouvent trouvé "
    "passer passait passent passé rester restait restent resté "
    "porter portait portent porté laisser laissait laissent laissé "
    "venue entendre entendait entendent entendu attendre attendait attendu "
    "répondre répondait répondu vivre vivait vivent vécu "
    "écrire écrivait écrivent écrit lire lisait lisent lu "
    "chose choses vie mort corps esprit idée idées mot mots nom noms "
    "point points place places forme formes partie parties côté côtés "
    "moment moments heure heures minute minutes semaine semaines mois "
    "fois raison question questions réponse réponses travail œil "
    "état états cas effet effets ordre ordres suite suites fin fins "
    "personne personnes groupe groupes nombre nombres mesure mesures "
    "eau air terre mer feu lumière ombre couleur couleurs bruit silence "
    "chemin route porte fenêtre table chambre salle jardin champ champs "
    "arbre arbres fleur fleurs oiseau oiseaux cheval chevaux chien chat "
    "livre livres page pages lettre lettres journal image images "
    "père mère fils fille filles frères sœurs oncle tante "
    "roi reine prince peuple pays nation guerre paix force "
    "amour joie peur espoir douleur plaisir bonheur malheur "
    "blanc blanche noir noire rouge bleu vert jaune gris clair sombre "
    "long longue court courte haut haute bas basse large étroit "
    "fort forte faible doux douce dur dure froid froide chaud chaude "
    "plein pleine vide seul seule libre vrai vraie faux fausse "
    "bon bonne mauvais mauvaise meilleur meilleure pire "
    "ainsi alors ensuite enfin puis donc pourtant cependant peut "
    "souvent parfois rarement bientôt tard tôt longtemps "
    "presque assez trop tant autant combien pourquoi comment quand "
    "devant derrière dessus dessous entre vers chez sans sous contre "
    "pendant depuis avant après jusque malgré selon parmi"
).split()


def sample_sentences(
    n: int, seed: int = 0, min_words: int = 3, max_words: int = 9, vocab=None
) -> list[str]:
    rng = np.random.default_rng(seed)
    words = np.asarray(vocab if vocab is not None else WORDS)
    out = []
    for _ in range(n):
        k = int(rng.integers(min_words, max_words + 1))
        out.append(" ".join(rng.choice(words, size=k)))
    return out


def build_corpus(out_dir: str | Path, n: int = 256, seed: int = 0, spec: SynthSpec | None = None) -> list[Path]:
    """Write n wav+txt pairs (the train_ctc.load_pairs layout)."""
    from ..utils.wavio import write_wav

    spec = spec or SynthSpec()
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for i, sent in enumerate(sample_sentences(n, seed=seed)):
        audio, _ = synth_sentence(sent, spec, seed=seed + i)
        wav = out_dir / f"synth_{i:04d}.wav"
        write_wav(wav, audio, spec.sample_rate)
        (out_dir / f"synth_{i:04d}.txt").write_text(sent, encoding="utf-8")
        paths.append(wav)
    return paths
