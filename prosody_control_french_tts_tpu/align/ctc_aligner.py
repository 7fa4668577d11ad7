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
    def __call__(self, mel, deterministic: bool = True, n_valid=None):
        """``n_valid`` (int32 scalar, downsampled-frame units) masks the
        global attention to the real frames so bucket-padded inputs produce
        the same logits on real frames as exact-length inputs (the convs
        are local; only ≤2 boundary frames see pad zeros). None = all
        frames real (training, exact-length calls)."""
        x = nn.Conv(self.dim, kernel_size=(3,), padding="SAME", dtype=jnp.bfloat16)(mel)
        x = jax.nn.gelu(x)
        x = nn.Conv(self.dim, kernel_size=(3,), strides=(2,), padding="SAME", dtype=jnp.bfloat16)(x)
        x = jax.nn.gelu(x)
        T = x.shape[-2]
        mask = None
        if n_valid is not None:
            mask = (jnp.arange(T) < n_valid)[None, None, :]  # [1(head), 1(q), T(kv)]
        pos = nn.Embed(4096, self.dim, dtype=jnp.bfloat16)(jnp.arange(T) % 4096)
        x = x + pos
        for i in range(self.layers):
            h = nn.LayerNorm(dtype=jnp.float32)(x)
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=jnp.bfloat16, deterministic=True
            )(h, mask=mask)
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
    #: fraction of detected speech that word intervals must cover before
    #: the speech-snap post-pass engages (auto mode)
    COVERAGE_TARGET = 0.90
    #: mean per-frame Viterbi emission log-prob below which the alignment
    #: counts as out-of-distribution (measured: in-distribution synthetic
    #: scores −0.16…−0.62/frame, the bundled real French −2.8…−3.2)
    OOD_SCORE_PER_FRAME = -1.5

    def align(
        self, audio: Audio, transcript: str | None = None, blank_bias: float | str = "auto"
    ) -> TextGrid:
        """Viterbi forced alignment of ``transcript`` to ``audio``.

        A forced alignment must span the audio (Code/Aligners/CTCFA.py:74),
        but on out-of-distribution audio the Viterbi path parks long
        stretches of real speech on the inter-word SPACE label (which
        belongs to no word span), so word intervals covered only ~74 % of
        detected speech in docs/real_audio_agreement_r04.json — and a blank
        log-penalty cannot fix it (measured: coverage saturates at 0.78 as
        the penalty → ∞ because the leak is the space label, not blank).
        Auto mode detects OOD input by the Viterbi path's mean per-frame
        emission log-prob (OOD_SCORE_PER_FRAME — the in/out distributions
        are separated by >2 nats/frame) and, when the alignment is OOD and
        covers < COVERAGE_TARGET of detected speech, ``_snap_to_speech``
        extends words through the in-gap speech, splitting runs at silence
        (the acoustically-defined boundary). In-distribution alignments are
        never touched, keeping the held-out synthetic boundary error bit-
        identical.

        ``blank_bias``: explicit log-penalty subtracted from the blank
        emission before Viterbi (a float disables auto mode)."""
        if transcript is None:
            raise ValueError("CTCAligner.align needs a transcript (use transcribe for ASR)")
        if self.params is None:
            raise ValueError("CTCAligner has no weights; train or load first")
        from ..utils.wavio import resample

        words = transcript.split()
        labels, spans = self.vocab.word_spans(words)
        a16 = audio.to_mono()
        if a16.rate != self.sample_rate:
            a16 = resample(a16, self.sample_rate)
        x = np.asarray(a16.samples, np.float32)
        # bucket-pad samples (pow-2) and labels (32s) so the whole corpus
        # reuses a handful of compiled programs: the un-padded path paid a
        # fresh XLA compile per distinct (audio length, transcript length)
        # pair AND dispatched the mel+conv stack eagerly (one ~30 ms tunnel
        # launch per op). ctc_forced_align takes true input_len/label_len,
        # so padding is exact by construction; only the last analysis
        # window sees pad zeros instead of the reflect tail (≤1 frame).
        n = x.shape[0]
        n_pad = 1 << max(int(n - 1).bit_length(), 14)
        true_frames = self._logits_frames(n)
        l_pad = ((len(labels) + 31) // 32) * 32
        labels_p = np.zeros(l_pad, np.int32)
        labels_p[: len(labels)] = labels
        auto = blank_bias == "auto"
        b = 0.0 if auto else float(blank_bias)
        states, score = self._align_device(
            jnp.asarray(np.pad(x, (0, n_pad - n))),
            jnp.asarray(labels_p),
            jnp.int32(true_frames),
            jnp.int32(len(labels)),
            jnp.float32(b),
        )
        states = np.asarray(states)[:true_frames]
        triples = states_to_words(states, labels, spans, self.frame_dt, words)
        if auto and float(score) / max(true_frames, 1) < self.OOD_SCORE_PER_FRAME:
            speech = self._speech_mask(a16)
            if self._speech_coverage(speech, triples) < self.COVERAGE_TARGET:
                triples = self._snap_to_speech(triples, speech)
        aligned = [AlignedWord(t0, t1, w) for t0, t1, w in triples]
        return words_to_textgrid(aligned, audio.to_mono().duration_seconds)

    def _logits_frames(self, n_samples: int) -> int:
        """Logits frames for an exact-length input: center-padded STFT gives
        1 + n//hop mel frames; the stride-2 SAME conv halves (ceil)."""
        return (1 + n_samples // self.hop + 1) // 2

    def _align_device(self, x, labels, n_frames, n_labels, bias):
        """ONE jitted launch: log_mel → encoder (attention masked to the
        real frames) → log-softmax → blank bias → Viterbi forced align.
        Memoized process-wide per (geometry, shapes) — the eager path paid
        one ~30 ms tunnel launch per op and a fresh XLA compile per
        distinct (audio, transcript) length pair."""
        from .whisper_jax import _memo_fn

        key = ("ctc_align", self.sample_rate, self.n_mels, self.model.dim, self.model.layers, len(self.vocab))
        model, blank, sr, hop, n_mels = self.model, self.vocab.blank, self.sample_rate, self.hop, self.n_mels

        def build():
            @jax.jit
            def run(params, x, labels, n_frames, n_labels, bias):
                mel = log_mel(x, sr, n_fft=400, hop_length=hop, n_mels=n_mels)
                logits = model.apply(params, mel, n_valid=n_frames)
                logp = jax.nn.log_softmax(logits, axis=-1)
                logp = logp.at[:, blank].add(-bias)
                return ctc_forced_align(logp, labels, n_frames, n_labels, blank=blank)

            return run

        return _memo_fn(key, build)(self.params, x, labels, n_frames, n_labels, bias)

    @staticmethod
    def _speech_mask(a16: Audio) -> np.ndarray:
        """Boolean per-ms detected-speech grid (the same label-free map
        eval.real_audio_agreement gates on)."""
        from ..ops.energy import detect_nonsilent

        x = np.asarray(a16.samples, np.float32)
        length_ms = max(int(len(x) * 1000 / a16.rate), 1)
        grid = np.zeros(length_ms, bool)
        for s, e in detect_nonsilent(x, a16.rate, min_silence_len=180, silence_thresh=-42.0):
            grid[s:e] = True
        return grid

    @staticmethod
    def _speech_coverage(speech: np.ndarray, triples) -> float:
        if not speech.any():
            return 1.0
        word = np.zeros_like(speech)
        for t0, t1, _ in triples:
            word[int(t0 * 1000) : int(t1 * 1000)] = True
        return float((word & speech).sum() / speech.sum())

    #: minimum uncovered speech in a gap (ms) before the snap fills it
    #: (only OOD-scored alignments reach the snap at all, so this is just
    #: a guard against sub-perceptual extensions)
    SNAP_MIN_GAP_SPEECH_MS = 30

    @classmethod
    def _snap_to_speech(cls, triples, speech: np.ndarray):
        """Extend word intervals through adjacent in-gap speech.

        For gaps holding ≥ SNAP_MIN_GAP_SPEECH_MS of uncovered speech,
        every speech ms is assigned to the nearer word; a silence run
        inside the gap stays unassigned, so the extended boundaries land
        on silence edges. Leading/trailing speech contiguous with the
        first/last word is absorbed likewise. Gaps that are true silences
        are untouched."""
        n_ms = len(speech)

        def gap_speech_ms(a: int, b: int) -> int:
            a, b = max(a, 0), min(b, n_ms)
            return int(speech[a:b].sum()) if b > a else 0

        out = []
        for i, (t0, t1, w) in enumerate(triples):
            s_ms, e_ms = int(t0 * 1000), int(t1 * 1000)
            prev_e = int(triples[i - 1][1] * 1000) if i > 0 else 0
            next_s = int(triples[i + 1][0] * 1000) if i + 1 < len(triples) else n_ms
            j = s_ms
            if gap_speech_ms(prev_e, s_ms) >= cls.SNAP_MIN_GAP_SPEECH_MS or (
                i == 0 and gap_speech_ms(0, s_ms) >= cls.SNAP_MIN_GAP_SPEECH_MS
            ):
                # backward: through speech down to the gap's split point
                lo = prev_e if i > 0 else 0
                split = (prev_e + s_ms) // 2 if i > 0 else 0
                while j > lo and j - 1 < n_ms and speech[j - 1] and (i == 0 or j > split):
                    j -= 1
            k = e_ms
            if gap_speech_ms(e_ms, next_s) >= cls.SNAP_MIN_GAP_SPEECH_MS:
                # forward: through speech up to the gap's split point
                hi = next_s if i + 1 < len(triples) else n_ms
                split_f = (e_ms + next_s) // 2 if i + 1 < len(triples) else n_ms
                while k < hi and k < n_ms and speech[k] and (i + 1 == len(triples) or k < split_f):
                    k += 1
            out.append((j / 1000.0, k / 1000.0, w))
        return out

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
