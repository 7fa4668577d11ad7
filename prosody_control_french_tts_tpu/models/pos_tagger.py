"""Contextual French POS tagger (tiny flax transformer, hermetic).

Replaces what the reference gets from spaCy ``fr_core_news_sm``
(Code/audioPipeline.py:26-27): context-dependent POS for the pause/comma
filters. The closed-class lexicon in ``utils/fr_pos`` answers per-token
and must commit ambiguous forms to one reading; this tagger reads the
sentence ("il a mangé" AUX vs "il va a paris" ADP, "son chien" DET vs
"le son" NOUN, "or, il pleut" CCONJ vs "l'or" NOUN, …).

TPU-first design: fixed [B, MAX_LEN] shapes (one compile), batched
windows for long inputs, bf16-friendly matmul sizes. The packaged
checkpoint (``models/pretrained/pos_fr.npz``) is trained hermetically on
the silver template treebank (models/pos_data.py); accuracy and the
downstream pause/comma drift vs the lexicon are pinned in
tests/test_pos_tagger.py and recorded in ROADMAP.md.

The tagger plugs into the existing hooks unchanged:
- ``ssml.syntagme.pipeline_syntagmes(pos_of=tagger.make_pos_of(words))``
- ``tagger.remove_spurious_commas(text)`` mirrors
  ``utils.fr_pos.remove_spurious_commas`` semantics contextually.
"""

from __future__ import annotations

import json
import re
import zlib
from dataclasses import dataclass
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import fr_pos
from .pos_data import FORBIDDEN_TAGS, TAG_TO_ID, TAGS, Sentence, strip_accents

__all__ = [
    "PosTaggerConfig",
    "PosTagger",
    "Featurizer",
    "ContextualTagger",
    "train_pos_tagger",
    "save_tagger",
    "load_tagger",
    "PACKAGED_WEIGHTS",
]

PACKAGED_WEIGHTS = Path(__file__).parent / "pretrained" / "pos_fr.npz"

MAX_LEN = 32
N_CHAR_BUCKETS = 4096

#: forms whose FORBIDDEN bit genuinely depends on context — the hybrid
#: backend consults the contextual tagger ONLY for these and lets the
#: closed-class lexicon answer everything else. Grading on real sentences
#: (tests/goldens/fr_pos_sentences.json) showed the silver-trained tagger
#: drifts on open real-register syntax (it can mis-tag even 'mais'/'par'),
#: while the lexicon is perfect on unambiguous closed-class forms — so
#: each source answers where it is reliable.
AMBIGUOUS_FORMS = {
    "son",  # DET (possessive) vs NOUN (sound)
    "car",  # CCONJ vs NOUN (bus)
    "or",  # CCONJ vs NOUN (gold)
    "personne",  # PRON (nobody) vs NOUN (person)
    "tout",  # DET/PRON vs NOUN/ADV
    "si",  # SCONJ vs ADV (intensifier)
    "soit",  # CCONJ (either) vs AUX (subjunctive être)
    "avant",  # ADP vs ADV
    "après",  # ADP vs ADV
    "a",  # unaccented à (ADP) vs avoir (AUX) in ASR text
}

_ELISION_SPLIT = re.compile(
    r"^([cdjlmnst]['’]|qu['’]|jusqu['’]|lorsqu['’]|puisqu['’]|quoiqu['’])(.+)$",
    re.IGNORECASE,
)


def tokenize_with_elisions(text: str) -> list[str]:
    """fr_pos-compatible tokenization, with elided clitics split off as
    their own tokens ("c'est" → ["c'", "est"]) — the treebank's convention."""
    out = []
    for tok in fr_pos.tokenize(text):
        m = _ELISION_SPLIT.match(tok)
        if m:
            out.append(m.group(1).replace("’", "'").lower())
            out.append(m.group(2))
        else:
            out.append(tok)
    return out


def _norm(tok: str) -> str:
    return tok.strip().lower().replace("’", "'")


def _stable_hash(s: str) -> int:
    # process-independent (Python's str hash is PYTHONHASHSEED-randomised,
    # which would break the packaged checkpoint's featurization)
    return zlib.crc32(s.encode("utf-8"))


def _char_ngrams(tok: str, n: int = 3) -> list[int]:
    s = f"^{_norm(tok)}$"
    if len(s) < n:
        return [_stable_hash(s) % N_CHAR_BUCKETS]
    return [_stable_hash(s[i : i + n]) % N_CHAR_BUCKETS for i in range(len(s) - n + 1)]


@dataclass(frozen=True)
class PosTaggerConfig:
    d_model: int = 96
    n_heads: int = 4
    n_layers: int = 2
    d_ff: int = 192
    n_tags: int = len(TAGS)
    max_len: int = MAX_LEN
    max_ngrams: int = 12  # char trigrams kept per token


class Featurizer:
    """text/tokens → fixed-shape (word_ids, char_ids, mask) arrays.

    The vocabulary is closed over the training treebank; unseen words map
    to <unk> and are represented by their char-trigram bag — real
    transcripts are full of content words the templates never saw, and
    the forbidden decision for those is always "not a function word",
    which suffix/prefix trigrams carry well in French.
    """

    def __init__(self, vocab: dict[str, int], cfg: PosTaggerConfig):
        self.vocab = vocab
        self.cfg = cfg

    @classmethod
    def build(cls, sentences: list[Sentence], cfg: PosTaggerConfig) -> "Featurizer":
        vocab = {"<pad>": 0, "<unk>": 1}
        for s in sentences:
            for w in s.words:
                w = _norm(w)
                if w not in vocab:
                    vocab[w] = len(vocab)
                ws = strip_accents(w)
                if ws not in vocab:
                    vocab[ws] = len(vocab)
        return cls(vocab, cfg)

    def encode_tokens(self, tokens: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        c = self.cfg
        L = c.max_len
        wid = np.zeros(L, np.int32)
        cid = np.zeros((L, c.max_ngrams), np.int32)
        mask = np.zeros(L, np.float32)
        for i, tok in enumerate(tokens[:L]):
            w = _norm(tok)
            wid[i] = self.vocab.get(w, 1)
            # +1 shift: char-bucket 0 is padding
            for j, g in enumerate(_char_ngrams(w)[: c.max_ngrams]):
                cid[i, j] = g + 1
            mask[i] = 1.0
        return wid, cid, mask

    def encode_batch(self, sents: list[list[str]]):
        enc = [self.encode_tokens(s) for s in sents]
        return (
            np.stack([e[0] for e in enc]),
            np.stack([e[1] for e in enc]),
            np.stack([e[2] for e in enc]),
        )


class _Block(nn.Module):
    cfg: PosTaggerConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        a = nn.LayerNorm()(x)
        a = nn.SelfAttention(num_heads=c.n_heads, qkv_features=c.d_model)(a, mask=mask)
        x = x + a
        h = nn.LayerNorm()(x)
        h = nn.Dense(c.d_ff)(h)
        h = nn.gelu(h)
        h = nn.Dense(c.d_model)(h)
        return x + h


class PosTagger(nn.Module):
    cfg: PosTaggerConfig = PosTaggerConfig()
    vocab_size: int = 2048

    @nn.compact
    def __call__(self, word_ids, char_ids, mask):
        """word_ids [B,L] int32, char_ids [B,L,G] int32 (0=pad),
        mask [B,L] float → logits [B,L,n_tags]."""
        c = self.cfg
        w = nn.Embed(self.vocab_size, c.d_model, name="word_embed")(word_ids)
        ch = nn.Embed(N_CHAR_BUCKETS + 1, c.d_model, name="char_embed")(char_ids)
        ch_mask = (char_ids > 0).astype(jnp.float32)[..., None]
        ch = (ch * ch_mask).sum(axis=2) / jnp.maximum(ch_mask.sum(axis=2), 1.0)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (c.max_len, c.d_model)
        )
        x = w + ch + pos[None, : word_ids.shape[1]]
        attn_mask = nn.make_attention_mask(mask > 0, mask > 0)
        for i in range(c.n_layers):
            x = _Block(c, name=f"block{i}")(x, attn_mask)
        x = nn.LayerNorm()(x)
        return nn.Dense(c.n_tags, name="out")(x)


def _loss_fn(params, model, batch):
    wid, cid, mask, tags = batch
    logits = model.apply({"params": params}, wid, cid, mask)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tags[..., None], axis=-1)[..., 0]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def train_pos_tagger(
    sentences: list[Sentence],
    cfg: PosTaggerConfig | None = None,
    steps: int = 500,
    batch_size: int = 256,
    lr: float = 3e-3,
    seed: int = 0,
    log_every: int = 100,
):
    """Train on the silver treebank; returns (params, featurizer, cfg)."""
    import optax

    cfg = cfg or PosTaggerConfig()
    feat = Featurizer.build(sentences, cfg)
    model = PosTagger(cfg, vocab_size=len(feat.vocab))

    toks = [list(s.words) for s in sentences]
    wid, cid, mask = feat.encode_batch(toks)
    tags = np.zeros((len(sentences), cfg.max_len), np.int32)
    for i, s in enumerate(sentences):
        for j, t in enumerate(s.tags[: cfg.max_len]):
            tags[i, j] = TAG_TO_ID[t]
    # word-dropout on OPEN-class tokens: real text is full of content words
    # the templates never saw; training must teach the model to tag them
    # from context + char n-grams alone. Closed classes are never dropped —
    # their identity IS the signal.
    open_tags = np.array(
        [TAG_TO_ID[t] for t in ("NOUN", "VERB", "ADJ", "ADV", "PROPN", "NUM")],
        np.int32,
    )
    droppable = np.isin(tags, open_tags) & (mask > 0)

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    params = model.init(key, wid[:2], cid[:2], mask[:2])["params"]
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps), weight_decay=1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(_loss_fn)(params, model, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(sentences)
    for it in range(steps):
        idx = rng.integers(0, n, batch_size)
        bw = wid[idx].copy()
        drop = droppable[idx] & (rng.random(bw.shape) < 0.35)
        bw[drop] = 1  # <unk>
        batch = (
            jnp.asarray(bw),
            jnp.asarray(cid[idx]),
            jnp.asarray(mask[idx]),
            jnp.asarray(tags[idx]),
        )
        params, opt_state, loss = step(params, opt_state, batch)
        if log_every and (it % log_every == 0 or it == steps - 1):
            print(f"pos_tagger step {it}: loss {float(loss):.4f}", flush=True)
    return params, feat, cfg


def save_tagger(params, feat: Featurizer, cfg: PosTaggerConfig, path: str | Path) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {
        "/".join(str(getattr(k, "key", k)) for k in kp): np.asarray(v, np.float16)
        for kp, v in flat
    }
    meta = {
        "vocab": feat.vocab,
        "cfg": {k: getattr(cfg, k) for k in (
            "d_model", "n_heads", "n_layers", "d_ff", "n_tags", "max_len", "max_ngrams"
        )},
    }
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_tagger(path: str | Path = PACKAGED_WEIGHTS):
    """→ (params, Featurizer, PosTaggerConfig); raises FileNotFoundError if
    the packaged checkpoint is absent."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    cfg = PosTaggerConfig(**meta["cfg"])
    params: dict = {}
    for flat_key, arr in arrays.items():
        parts = flat_key.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr, jnp.float32)
    return params, Featurizer(meta["vocab"], cfg), cfg


class ContextualTagger:
    """Inference wrapper: whole-sentence tagging with fixed-shape jit.

    Long inputs are tagged in overlapping MAX_LEN windows (stride
    ``max_len - 2*overlap``); each token takes its label from the window
    where it sits furthest from the edges, so every decision has context
    on both sides.
    """

    _OVERLAP = 8

    def __init__(self, params=None, feat: Featurizer | None = None, cfg=None):
        if params is None:
            params, feat, cfg = load_tagger()
        self.params = params
        self.feat = feat
        self.cfg = cfg
        model = PosTagger(cfg, vocab_size=len(feat.vocab))
        self._apply = jax.jit(
            lambda w, c, m: jnp.argmax(model.apply({"params": self.params}, w, c, m), -1)
        )
        self._cache: dict[tuple, tuple[str, ...]] = {}

    def tag_tokens(self, tokens: list[str]) -> list[str]:
        if not tokens:
            return []
        key = tuple(_norm(t) for t in tokens)
        hit = self._cache.get(key)
        if hit is not None:
            return list(hit)
        L, ov = self.cfg.max_len, self._OVERLAP
        stride = L - 2 * ov
        if len(tokens) <= L:
            windows = [(0, tokens)]
        else:
            windows = []
            s = 0
            while s < len(tokens):
                windows.append((s, tokens[s : s + L]))
                if s + L >= len(tokens):
                    break
                s += stride
        wid, cid, mask = self.feat.encode_batch([w for _, w in windows])
        pred = np.asarray(self._apply(jnp.asarray(wid), jnp.asarray(cid), jnp.asarray(mask)))
        out = [""] * len(tokens)
        best_center = [-1.0] * len(tokens)
        for (s, wtoks), row in zip(windows, pred):
            for j in range(len(wtoks)):
                # distance from the nearer window edge = available context
                centrality = min(j, len(wtoks) - 1 - j)
                if centrality > best_center[s + j]:
                    best_center[s + j] = centrality
                    out[s + j] = TAGS[int(row[j])]
        if len(self._cache) > 512:
            self._cache.clear()
        self._cache[key] = tuple(out)
        return out

    def tag_text(self, text: str) -> list[tuple[str, str]]:
        toks = tokenize_with_elisions(text)
        return list(zip(toks, self.tag_tokens(toks)))

    def is_function_word_at(self, tokens: list[str], i: int) -> bool:
        return self.tag_tokens(tokens)[i] in FORBIDDEN_TAGS

    def make_pos_of(self, words: list[str]):
        """Closure for ``ssml.syntagme`` hooks: tags the WHOLE word
        sequence once, then answers per-token queries POSITIONALLY.
        The pause filter passes the word index of each query (it only asks
        about words directly preceding a pause, so token matching alone
        cannot tell repeated occurrences apart — ADVICE r4); the index
        resolves the exact occurrence. Index-less queries fall back to a
        monotonic forward scan."""
        # each "word" from the textgrid may be multi-token; the filters ask
        # about the first token (fr_pos.first_token_pos semantics)
        first_toks: list[tuple[int, str]] = []
        flat: list[str] = []
        for w in words:
            toks = tokenize_with_elisions(w.strip()) or [""]
            first_toks.append((len(flat), toks[0]))
            flat.extend(toks)
        tags = self.tag_tokens(flat) if flat else []
        norm_first = [_norm(tok) for _, tok in first_toks]
        ptr = 0

        def pos_of(query: str, word_index: int | None = None) -> str:
            nonlocal ptr
            toks = tokenize_with_elisions(query.strip())
            if not toks:
                return "X"
            q = _norm(toks[0])
            if q not in AMBIGUOUS_FORMS:
                # hybrid: the lexicon is authoritative off the ambiguous set
                if word_index is not None:
                    ptr = max(ptr, word_index + 1)
                return fr_pos.first_token_pos(query)
            if word_index is not None and 0 <= word_index < len(norm_first):
                if norm_first[word_index] == q:
                    ptr = word_index + 1
                    tag = tags[first_toks[word_index][0]]
                    return tag if tag in FORBIDDEN_TAGS else "X"
                # index/token mismatch (caller cleaned differently) —
                # fall through to the scan
            # scan forward from the pointer: queried words arrive in
            # sequence order
            for i in range(ptr, len(norm_first)):
                if norm_first[i] == q:
                    ptr = i + 1
                    tag = tags[first_toks[i][0]]
                    return tag if tag in FORBIDDEN_TAGS else "X"
            # unseen query (e.g. cleaned differently) — fall back
            return fr_pos.first_token_pos(query)

        return pos_of

    def remove_spurious_commas(self, text: str) -> str:
        """Contextual twin of ``fr_pos.remove_spurious_commas`` — same span
        splice; the forbidden bit comes from the sentence-level tags for
        AMBIGUOUS_FORMS and from the lexicon everywhere else (hybrid)."""
        matches = list(fr_pos._TOKEN_RE.finditer(text))
        toks = []
        tok_of_match = []
        for m in matches:
            sub = tokenize_with_elisions(m.group(0))
            tok_of_match.append((len(toks), len(sub)))
            toks.extend(sub)
        tags = self.tag_tokens(toks) if toks else []
        removed_spans: list[tuple[int, int]] = []
        prev_forbidden = False
        for m, (ti, tn) in zip(matches, tok_of_match):
            tok = m.group(0)
            if (tok == "," or tok == "[*]") and prev_forbidden:
                removed_spans.append((m.start(), m.end()))
                continue
            if tok == "[" and text[m.start() : m.start() + 3] == "[*]" and prev_forbidden:
                removed_spans.append((m.start(), m.start() + 3))
                continue
            if tok.strip():
                if tok[0].isalnum() or "'" in tok:
                    last = ti + tn - 1
                    if tags and _norm(toks[last]) in AMBIGUOUS_FORMS:
                        prev_forbidden = tags[last] in FORBIDDEN_TAGS
                    else:
                        prev_forbidden = fr_pos.pos_tag(toks[last]) in fr_pos.FORBIDDEN
                else:
                    prev_forbidden = False
        if not removed_spans:
            return text
        res = []
        last = 0
        for s, e in removed_spans:
            res.append(text[last:s])
            if e < len(text) and text[e] == " " and (s > 0 and text[s - 1] == " "):
                e += 1
            last = e
        res.append(text[last:])
        return "".join(res)


@dataclass(frozen=True)
class PosBackend:
    """What the pipeline consumes: per-token POS for chunk heads, the comma
    filter, and (contextual only) a sentence-aware pos_of factory for the
    syntagme pause filter (None → per-token default)."""

    first_token_pos: object
    remove_spurious_commas: object
    pos_of_factory: object = None


def get_pos_backend(name: str) -> PosBackend:
    """Config hook: "lexicon" (default) → fr_pos functions; "contextual" →
    the packaged flax tagger."""
    if name == "lexicon":
        return PosBackend(fr_pos.first_token_pos, fr_pos.remove_spurious_commas)
    if name == "contextual":
        tagger = ContextualTagger()

        def first_token_pos(text: str) -> str:
            toks = tokenize_with_elisions(text.strip())
            if not toks:
                return "X"
            if _norm(toks[0]) not in AMBIGUOUS_FORMS:
                return fr_pos.first_token_pos(text)  # hybrid: lexicon rules
            tag = tagger.tag_tokens(toks)[0]
            return tag if tag in FORBIDDEN_TAGS else "X"

        return PosBackend(first_token_pos, tagger.remove_spurious_commas, tagger.make_pos_of)
    raise ValueError(f"unknown pos backend: {name!r} (use 'lexicon' or 'contextual')")
