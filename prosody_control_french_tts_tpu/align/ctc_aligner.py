"""CTC forced aligner: a trainable acoustic model + Viterbi alignment.

The hermetic, fully-on-TPU member of the aligner family — the counterpart
of the reference's MFA/NeMo/ctc-forced-aligner subprocesses
(Code/Aligners/Use_MFA.py, NeMo.py, CTCFA.py). A small conv-transformer
encoder maps log-mel frames to character logits; word spans come from the
blank-interleaved Viterbi path (align.ctc). The model trains from wav+text
pairs with the CTC loss (one jitted step), so a project can bootstrap an
aligner from its own corpus without any downloaded checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import log_mel
from ..utils.textgridio import TextGrid
from ..utils.wavio import Audio
from .base import AlignedWord, words_to_textgrid
from .ctc import ctc_forced_align, ctc_loss, states_to_words

FR_CHARS = " abcdefghijklmnopqrstuvwxyzàâäéèêëîïôöùûüÿçœ'-"


@dataclass
class CharVocab:
    chars: str = FR_CHARS

    @property
    def blank(self) -> int:
        return 0

    def __len__(self) -> int:
        return len(self.chars) + 1  # + blank

    def encode(self, text: str) -> list[int]:
        text = text.lower()
        return [self.chars.index(c) + 1 for c in text if c in self.chars]

    def word_spans(self, words: list[str]) -> tuple[list[int], list[tuple[int, int]]]:
        """Concatenated label sequence (spaces between words) + per-word
        [start, end) label index spans."""
        labels: list[int] = []
        spans: list[tuple[int, int]] = []
        for i, w in enumerate(words):
            if i > 0:
                labels.extend(self.encode(" "))
            start = len(labels)
            labels.extend(self.encode(w))
            spans.append((start, len(labels)))
        return labels, spans


class CTCEncoder(nn.Module):
    """log-mel [T, M] → frame char logits [T/2, V]: 2×conv (stride 2 on the
    second, Whisper-style) + transformer blocks."""

    vocab_size: int
    dim: int = 128
    layers: int = 2
    heads: int = 4

    @nn.compact
    def __call__(self, mel, deterministic: bool = True):
        x = nn.Conv(self.dim, kernel_size=(3,), padding="SAME", dtype=jnp.bfloat16)(mel)
        x = jax.nn.gelu(x)
        x = nn.Conv(self.dim, kernel_size=(3,), strides=(2,), padding="SAME", dtype=jnp.bfloat16)(x)
        x = jax.nn.gelu(x)
        T = x.shape[-2]
        pos = nn.Embed(4096, self.dim, dtype=jnp.bfloat16)(jnp.arange(T) % 4096)
        x = x + pos
        for i in range(self.layers):
            h = nn.LayerNorm(dtype=jnp.float32)(x)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=jnp.bfloat16, deterministic=True
            )(h)
            x = x + attn
            h = nn.LayerNorm(dtype=jnp.float32)(x)
            h = nn.Dense(self.dim * 4, dtype=jnp.bfloat16)(h)
            h = jax.nn.gelu(h)
            x = x + nn.Dense(self.dim, dtype=jnp.bfloat16)(h)
        x = nn.LayerNorm(dtype=jnp.float32)(x)
        return nn.Dense(self.vocab_size, dtype=jnp.float32)(x)


class CTCAligner:
    """Aligner-protocol implementation. ``frame_dt`` = hop/sr × 2 (conv
    stride)."""

    def __init__(
        self,
        params=None,
        vocab: CharVocab | None = None,
        sample_rate: int = 16000,
        n_mels: int = 80,
        dim: int = 128,
        layers: int = 2,
        weights_path: str | Path | None = None,
    ):
        self.vocab = vocab or CharVocab()
        self.sample_rate = sample_rate
        self.n_mels = n_mels
        self.model = CTCEncoder(vocab_size=len(self.vocab), dim=dim, layers=layers)
        self.hop = 160
        self.frame_dt = self.hop / sample_rate * 2.0
        if weights_path is not None:
            params = load_params(weights_path)
        elif (
            params is None
            and dim == 128
            and layers == 2
            and vocab is None
            and sample_rate == 16000
            and n_mels == 80
        ):
            # out-of-the-box default: the packaged checkpoint pretrained on
            # compositional synthetic French speech (align/pretrain_ctc.py)
            # — the role MFA/NeMo pretrained models play for the reference.
            # Projects fine-tune via train_ctc or pass weights_path.
            packaged = Path(__file__).parent / "pretrained" / "ctc_fr_synth.npz"
            if packaged.exists():
                params = load_params(packaged)
        self.params = params

    # -- feature extraction -------------------------------------------------
    def features(self, audio: Audio) -> jnp.ndarray:
        from ..utils.wavio import resample

        audio = audio.to_mono()
        if audio.rate != self.sample_rate:
            audio = resample(audio, self.sample_rate)
        x = jnp.asarray(np.asarray(audio.samples, np.float32))
        return log_mel(x, self.sample_rate, n_fft=400, hop_length=self.hop, n_mels=self.n_mels)

    def init_params(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        mel = jnp.zeros((100, self.n_mels))
        self.params = self.model.init(rng, mel)
        return self.params

    # -- alignment ------------------------------------------------------------
    def align(self, audio: Audio, transcript: str | None = None) -> TextGrid:
        if transcript is None:
            raise ValueError("CTCAligner.align needs a transcript (use transcribe for ASR)")
        if self.params is None:
            raise ValueError("CTCAligner has no weights; train or load first")
        words = transcript.split()
        labels, spans = self.vocab.word_spans(words)
        mel = self.features(audio)
        logits = self.model.apply(self.params, mel)
        logp = jax.nn.log_softmax(logits, axis=-1)
        states, _ = ctc_forced_align(
            logp,
            jnp.asarray(labels, jnp.int32),
            jnp.int32(logp.shape[0]),
            jnp.int32(len(labels)),
            blank=self.vocab.blank,
        )
        triples = states_to_words(np.asarray(states), labels, spans, self.frame_dt, words)
        aligned = [AlignedWord(t0, t1, w) for t0, t1, w in triples]
        return words_to_textgrid(aligned, audio.to_mono().duration_seconds)

    def transcribe(self, audio: Audio) -> str:
        """Greedy CTC decode (collapse repeats, drop blanks)."""
        if self.params is None:
            raise ValueError("CTCAligner has no weights")
        mel = self.features(audio)
        ids = np.asarray(jnp.argmax(self.model.apply(self.params, mel), axis=-1))
        out = []
        prev = -1
        for i in ids:
            if i != prev and i != self.vocab.blank:
                out.append(self.vocab.chars[i - 1])
            prev = i
        return "".join(out).strip()

    # -- training ----------------------------------------------------------
    def make_train_step(self, lr: float = 3e-4):
        import optax

        tx = optax.adam(lr)

        def init(params):
            return tx.init(params)

        @jax.jit
        def step(params, opt_state, mel, mel_len, labels, label_len):
            def loss_fn(p):
                logits = self.model.apply(p, mel)
                logp = jax.nn.log_softmax(logits, axis=-1)
                return ctc_loss(logp, labels, mel_len, label_len, blank=self.vocab.blank)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        return init, step


def save_params(params, path: str | Path) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    np.savez(
        path,
        **{"/".join(getattr(k, "key", str(k)) for k in p): np.asarray(v) for p, v in flat},
    )


def load_params(path: str | Path):
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        v = data[key]
        if np.issubdtype(v.dtype, np.floating):
            v = v.astype(np.float32)  # checkpoints may be stored float16
        node[parts[-1]] = jnp.asarray(v)
    return tree
