"""Whisper-family encoder-decoder in flax, with word-level timestamps.

TPU-native replacement for the reference's primary aligner, the
whisper-timestamped stack (Code/Aligners/use_whisper_timestamped.py):

- architecture: log-mel front-end (ops.stft.log_mel), conv×2 (stride 2)
  encoder with sinusoidal positions, pre-LN transformer; decoder with
  learned positions, causal self-attention + cross-attention, tied
  embedding head — the Whisper geometry, written fresh, sized by config
  (``tiny``/``base``/... presets) so published weights can be ported via
  the npz loader (no network in this environment);
- word timestamps: DTW over the time-axis-normalised cross-attention
  matrix (the whisper-timestamped technique) → monotonic token↔frame
  path → per-token times → whitespace-grouped word intervals;
- the reference's audio gates and degraded outputs: RMS < 100 (int16
  scale) or silence ratio > 95 % → the "..." placeholder result
  (use_whisper_timestamped.py:197-261), preserved verbatim because
  downstream steps key on the "..." convention.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import log_mel
from ..utils.textgridio import TextGrid
from ..utils.wavio import Audio
from .base import AlignedWord, words_to_textgrid

SAMPLE_RATE = 16000
HOP = 160
FRAME_DT = 2 * HOP / SAMPLE_RATE  # encoder stride-2 → 20 ms per frame


@dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    dtype: object = jnp.bfloat16
    n_audio_ctx: int = 1500  # 30 s windows
    n_text_ctx: int = 448
    dim: int = 384
    heads: int = 6
    enc_layers: int = 4
    dec_layers: int = 4
    vocab_size: int = 8000  # hermetic tokenizer; 51865 for ported weights

    @classmethod
    def tiny(cls, vocab_size: int = 8000) -> "WhisperConfig":
        return cls(dim=384, heads=6, enc_layers=4, dec_layers=4, vocab_size=vocab_size)

    @classmethod
    def test(cls, vocab_size: int = 256) -> "WhisperConfig":
        return cls(dim=64, heads=2, enc_layers=1, dec_layers=1, vocab_size=vocab_size, n_audio_ctx=200, n_text_ctx=64)

    @classmethod
    def base(cls, vocab_size: int = 51865) -> "WhisperConfig":
        return cls(dim=512, heads=8, enc_layers=6, dec_layers=6, vocab_size=vocab_size)

    @classmethod
    def small(cls, vocab_size: int = 51865) -> "WhisperConfig":
        return cls(dim=768, heads=12, enc_layers=12, dec_layers=12, vocab_size=vocab_size)

    @classmethod
    def medium(cls, vocab_size: int = 51865) -> "WhisperConfig":
        return cls(dim=1024, heads=16, enc_layers=24, dec_layers=24, vocab_size=vocab_size)


def sinusoids(length: int, channels: int) -> np.ndarray:
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


class _MHA(nn.Module):
    cfg: WhisperConfig
    causal: bool = False

    @nn.compact
    def __call__(self, q_in, kv_in, return_weights: bool = False):
        c = self.cfg
        hd = c.dim // c.heads
        q = nn.DenseGeneral((c.heads, hd), name="q", dtype=c.dtype)(q_in)
        k = nn.DenseGeneral((c.heads, hd), name="k", use_bias=False, dtype=c.dtype)(kv_in)
        v = nn.DenseGeneral((c.heads, hd), name="v", dtype=c.dtype)(kv_in)
        att = jnp.einsum("...qhd,...khd->...hqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
        if self.causal:
            L, S = q_in.shape[-2], kv_in.shape[-2]
            mask = jnp.tril(jnp.ones((L, S), bool), k=S - L)
            att = jnp.where(mask, att, jnp.finfo(att.dtype).min)
        w = jax.nn.softmax(att.astype(jnp.float32), axis=-1)
        out = jnp.einsum("...hqk,...khd->...qhd", w.astype(q.dtype), v)
        out = nn.DenseGeneral(c.dim, axis=(-2, -1), name="out", dtype=c.dtype)(out)
        return (out, w) if return_weights else (out, None)


class _Block(nn.Module):
    cfg: WhisperConfig
    cross: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, x, enc=None, collect_cross: bool = False):
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_attn")(x)
        h, _ = _MHA(self.cfg, causal=self.causal, name="attn")(h, h)
        x = x + h
        cross_w = None
        if self.cross:
            hn = nn.LayerNorm(dtype=jnp.float32, name="ln_cross")(x)
            h, cross_w = _MHA(self.cfg, name="cross")(hn, enc, return_weights=collect_cross)
            x = x + h
        hn = nn.LayerNorm(dtype=jnp.float32, name="ln_ffn")(x)
        h = nn.Dense(self.cfg.dim * 4, dtype=self.cfg.dtype, name="fc1")(hn)
        h = jax.nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.cfg.dim, dtype=self.cfg.dtype, name="fc2")(h)
        return x, cross_w


class WhisperEncoder(nn.Module):
    cfg: WhisperConfig

    @nn.compact
    def __call__(self, mel):  # mel: [T, n_mels]
        c = self.cfg
        # explicit (1,1) padding = torch Conv1d(padding=1): keeps ported
        # checkpoints sample-aligned (SAME pads (0,1) at stride 2)
        x = nn.Conv(c.dim, (3,), padding=((1, 1),), dtype=c.dtype, name="conv1")(mel)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(c.dim, (3,), strides=(2,), padding=((1, 1),), dtype=c.dtype, name="conv2")(x)
        x = jax.nn.gelu(x, approximate=False)
        T = x.shape[-2]
        x = x + jnp.asarray(sinusoids(c.n_audio_ctx, c.dim))[:T]
        for i in range(c.enc_layers):
            x, _ = _Block(c, name=f"block_{i}")(x)
        return nn.LayerNorm(dtype=jnp.float32, name="ln_post")(x)


class WhisperDecoder(nn.Module):
    cfg: WhisperConfig

    @nn.compact
    def __call__(self, tokens, enc, collect_cross: bool = False):
        c = self.cfg
        emb = nn.Embed(c.vocab_size, c.dim, name="tok_emb", dtype=c.dtype)
        pos = self.param("pos_emb", nn.initializers.normal(0.01), (c.n_text_ctx, c.dim), jnp.float32)
        x = emb(tokens) + pos[: tokens.shape[-1]].astype(c.dtype)
        cross_ws = []
        for i in range(c.dec_layers):
            x, w = _Block(c, cross=True, causal=True, name=f"block_{i}")(
                x, enc, collect_cross=collect_cross
            )
            if collect_cross and w is not None:
                cross_ws.append(w)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln_post")(x)
        logits = x @ emb.embedding.T.astype(x.dtype)
        return logits, cross_ws


class WhisperModel(nn.Module):
    cfg: WhisperConfig

    def setup(self):
        self.encoder = WhisperEncoder(self.cfg)
        self.decoder = WhisperDecoder(self.cfg)

    def __call__(self, mel, tokens, collect_cross: bool = False):
        enc = self.encoder(mel)
        return self.decoder(tokens, enc, collect_cross)

    def encode(self, mel):
        return self.encoder(mel)

    def decode(self, tokens, enc, collect_cross: bool = False):
        return self.decoder(tokens, enc, collect_cross)


# ---------------------------------------------------------------------------
# cross-attention DTW timestamps (whisper-timestamped technique)
# ---------------------------------------------------------------------------


def token_times_from_cross_attention(
    cross_ws: list[jnp.ndarray], n_frames: int, frame_dt: float = FRAME_DT
) -> np.ndarray:
    """cross_ws: per-layer [..., heads, tokens, frames] weights →
    [tokens, 2] start/end seconds via DTW over the head-averaged,
    per-token-normalised attention."""
    w = np.mean([np.asarray(x, np.float32) for x in cross_ws], axis=0)
    while w.ndim > 3:
        w = w.mean(axis=0)
    w = w.mean(axis=0)  # [tokens, frames]
    w = w[:, :n_frames]
    # normalise per token, build a cost and DTW a monotonic path
    w = w / np.maximum(w.sum(axis=-1, keepdims=True), 1e-9)
    cost_tokens = -w  # maximise attention ≡ minimise cost
    n_tok, n_fr = cost_tokens.shape
    # DP over (token, frame) with steps (1,1) and (0,1): every token gets a
    # contiguous frame span
    INF = 1e30
    D = np.full((n_tok + 1, n_fr + 1), INF)
    D[0, :] = 0.0
    choice = np.zeros((n_tok + 1, n_fr + 1), np.int8)
    for i in range(1, n_tok + 1):
        for j in range(1, n_fr + 1):
            diag = D[i - 1, j - 1]
            left = D[i, j - 1]
            if diag <= left:
                D[i, j] = diag + cost_tokens[i - 1, j - 1]
                choice[i, j] = 1
            else:
                D[i, j] = left + cost_tokens[i - 1, j - 1]
                choice[i, j] = 0
    # backtrack
    spans = np.zeros((n_tok, 2))
    i, j = n_tok, n_fr
    end_j = j
    while i > 0 and j > 0:
        if choice[i, j] == 1:
            spans[i - 1] = (j - 1, end_j)
            i -= 1
            end_j = j - 1
        j -= 1
    return spans * frame_dt


def group_word_times(tokens: list[str], token_spans: np.ndarray) -> list[AlignedWord]:
    """Whitespace-boundary grouping of subword tokens into words."""
    words: list[AlignedWord] = []
    cur = ""
    t0 = None
    t1 = 0.0
    for tok, (s, e) in zip(tokens, token_spans):
        starts_word = tok.startswith(" ") or not cur
        if starts_word and cur:
            words.append(AlignedWord(t0, t1, cur.strip()))
            cur = ""
            t0 = None
        if t0 is None:
            t0 = float(s)
        cur += tok
        t1 = float(e)
    if cur.strip():
        words.append(AlignedWord(t0 or 0.0, t1, cur.strip()))
    return words


# ---------------------------------------------------------------------------
# audio gates (use_whisper_timestamped.py:197-261)
# ---------------------------------------------------------------------------


def check_audio_content(samples: np.ndarray, int_scale: float = 32768.0) -> tuple[bool, str]:
    data = np.asarray(samples, np.float32) * int_scale
    if data.size == 0:
        return False, "empty audio"
    rms = float(np.sqrt(np.mean(np.square(data))))
    silence_ratio = 1.0 - float(np.sum(np.abs(data) > 500) / data.size)
    if silence_ratio > 0.95:
        return False, f"File mainly contains silence ({silence_ratio:.2f})"
    if rms < 100:
        return False, f"Very low audio level (RMS={rms:.0f})"
    return True, "Audio valide"


EMPTY_TEXT = "..."
DISFLUENCY_MARK = "[*]"  # whisper-timestamped's pause/disfluency marker


def vad_speech_regions(
    audio: Audio,
    min_silence_ms: int = 400,
    silence_thresh_db: float = -40.0,
    keep_silence_ms: int = 100,
) -> list[tuple[float, float]]:
    """Energy-based VAD: speech spans in seconds (the auditok stand-in the
    reference passes to whisper.transcribe, use_whisper_timestamped.py:152).
    Raises ValueError mentioning ``max_silence`` on audio too short to
    window — the exact failure the reference's no-VAD retry catches
    (:163-170, auditok raises when duration < max_silence)."""
    from ..ops.energy import split_on_silence_ranges

    a = audio.to_mono()
    x = np.asarray(a.samples, np.float32)
    dur_ms = len(x) * 1000.0 / a.rate
    if dur_ms < 2 * min_silence_ms:
        raise ValueError(f"max_silence ({min_silence_ms} ms) is larger than audio duration")
    ranges = split_on_silence_ranges(x, a.rate, min_silence_ms, silence_thresh_db, keep_silence_ms)
    return [(s / 1000.0, e / 1000.0) for s, e in ranges]


def mark_disfluencies(
    words: list[AlignedWord],
    speech_regions: list[tuple[float, float]],
    min_gap_s: float = 0.3,
) -> list[AlignedWord]:
    """Insert ``[*]`` entries in word-stream gaps that fall inside detected
    speech (the model heard something but aligned no word there) — the
    behavioral equivalent of whisper-timestamped's detect_disfluencies
    (use_whisper_timestamped.py:154; markers surface in word texts and are
    replaced with " " in the TextGrid, :375)."""

    def in_speech(t0: float, t1: float) -> bool:
        mid = 0.5 * (t0 + t1)
        return any(s <= mid <= e for s, e in speech_regions)

    out: list[AlignedWord] = []
    prev_end = speech_regions[0][0] if speech_regions else 0.0
    for w in sorted(words, key=lambda w: w.start):
        gap = w.start - prev_end
        if gap >= min_gap_s and in_speech(prev_end, w.start):
            out.append(AlignedWord(prev_end, w.start, DISFLUENCY_MARK))
        out.append(w)
        prev_end = max(prev_end, w.end)
    return out


def empty_result() -> dict:
    """The reference's placeholder result shape
    (use_whisper_timestamped.py:244-261)."""
    return {
        "text": EMPTY_TEXT,
        "segments": [
            {
                "id": 0,
                "start": 0.0,
                "end": 1.0,
                "text": EMPTY_TEXT,
                "words": [{"start": 0.0, "end": 1.0, "text": EMPTY_TEXT, "confidence": 0.0}],
            }
        ],
    }


class WhisperAligner:
    """Aligner-protocol wrapper: transcribe (greedy) + timestamp via
    cross-attention DTW. Requires trained/ported weights to produce real
    text; the gates and placeholder semantics work regardless."""

    def __init__(
        self,
        cfg: WhisperConfig | None = None,
        params=None,
        tokenizer=None,
        weights_path=None,
        use_vad: bool = True,
        detect_disfluencies: bool = True,
    ):
        self.cfg = cfg or WhisperConfig.tiny()
        self.model = WhisperModel(self.cfg)
        self.tokenizer = tokenizer
        if weights_path is not None:
            from .ctc_aligner import load_params

            params = load_params(weights_path)
        self.params = params
        # the reference's transcription defaults: vad="auditok",
        # detect_disfluencies=True (use_whisper_timestamped.py:150-156)
        self.use_vad = use_vad
        self.detect_disfluencies = detect_disfluencies

    @classmethod
    def from_pretrained(cls, path, **kwargs) -> "WhisperAligner":
        """Load a deployed checkpoint directory: ``config.json`` (geometry),
        ``weights.npz`` (ported via models.port_weights.whisper_to_flax or
        trained here), and any supported tokenizer artifact
        (tokenizer.json / vocab.json+merges.txt / *.tiktoken / *.bpe.json).
        The out-of-the-box experience of the reference's model download
        (use_whisper_timestamped.py:92-104), minus the network."""
        import json
        from pathlib import Path

        from ..models.bpe_tokenizer import load_whisper_tokenizer
        from .ctc_aligner import load_params

        p = Path(path)
        cfg_file = p / "config.json"
        if cfg_file.exists():
            d = json.loads(cfg_file.read_text(encoding="utf-8"))
            d.pop("dtype", None)
            cfg = WhisperConfig(**d)
        else:
            cfg = WhisperConfig.base()
        tokenizer = load_whisper_tokenizer(p)
        params = load_params(p / "weights.npz")
        return cls(cfg, params=params, tokenizer=tokenizer, **kwargs)

    def save_pretrained(self, path) -> None:
        import dataclasses
        import json
        from pathlib import Path

        from .ctc_aligner import save_params

        p = Path(path)
        p.mkdir(parents=True, exist_ok=True)
        d = dataclasses.asdict(self.cfg)
        d.pop("dtype", None)
        (p / "config.json").write_text(json.dumps(d), encoding="utf-8")
        save_params(self.params, p / "weights.npz")
        if hasattr(self.tokenizer, "specials"):  # ByteLevelBPE artifact
            self.tokenizer.save(p / "tokenizer.bpe.json")
        elif hasattr(self.tokenizer, "save"):  # WordPiece vocab json
            self.tokenizer.save(p / "wordpiece_vocab.json")

    def features(self, audio: Audio) -> jnp.ndarray:
        from ..utils.wavio import resample

        audio = audio.to_mono()
        if audio.rate != SAMPLE_RATE:
            audio = resample(audio, SAMPLE_RATE)
        x = np.asarray(audio.samples, np.float32)
        # whisper convention: zero-pad the window to exactly n_audio_ctx·2
        # mel frames (the sinusoidal table's length after the stride-2 conv)
        max_mel = self.cfg.n_audio_ctx * 2
        want = max_mel * HOP
        if x.shape[0] < want:
            x = np.pad(x, (0, want - x.shape[0]))
        mel = log_mel(jnp.asarray(x), SAMPLE_RATE, n_fft=400, hop_length=HOP, n_mels=self.cfg.n_mels)
        return mel[:max_mel]

    def align(self, audio: Audio, transcript: str | None = None) -> TextGrid:
        audio = audio.to_mono()
        ok, reason = check_audio_content(np.asarray(audio.samples))
        if not ok:
            return words_to_textgrid(
                [AlignedWord(0.0, min(1.0, audio.duration_seconds), EMPTY_TEXT)],
                audio.duration_seconds,
            )
        if self.params is None or self.tokenizer is None:
            raise ValueError("WhisperAligner needs weights + tokenizer")
        dur = audio.duration_seconds
        regions: list[tuple[float, float]] | None = None
        words: list[AlignedWord] | None = None
        if self.use_vad:
            try:
                regions = vad_speech_regions(audio)
            except ValueError as e:
                # auditok-parity failure on short audio → retry without VAD
                # (use_whisper_timestamped.py:163-170)
                if "max_silence" not in str(e):
                    raise
                regions = None
            if regions:
                words = self._align_regions(audio, transcript, regions)
        if words is None:
            words = self._align_words(audio, transcript)
        if self.detect_disfluencies:
            words = mark_disfluencies(words, regions if regions else [(0.0, dur)])
        # the reference's TextGrid replaces the marker with " "
        # (use_whisper_timestamped.py:375) so downstream sees a pause: pure
        # markers become silence gaps in our ""-silence convention
        words = [
            AlignedWord(w.start, w.end, w.word.replace(DISFLUENCY_MARK, " ").strip())
            for w in words
        ]
        return words_to_textgrid([w for w in words if w.word], dur)

    def _align_regions(
        self, audio: Audio, transcript: str | None, regions: list[tuple[float, float]]
    ) -> list[AlignedWord]:
        """Per-speech-region alignment with transcript words apportioned by
        region duration; times offset back to the full-audio clock."""
        words_all = transcript.split() if transcript is not None else None
        total_speech = sum(e - s for s, e in regions) or 1e-9
        out: list[AlignedWord] = []
        wi = 0
        for k, (t0, t1) in enumerate(regions):
            sub = audio.slice_ms(t0 * 1000, t1 * 1000)
            if words_all is not None:
                if k < len(regions) - 1:
                    share = int(round(len(words_all) * (t1 - t0) / total_speech))
                    chunk = words_all[wi : wi + max(share, 0)]
                else:
                    chunk = words_all[wi:]
                wi += len(chunk)
                if not chunk:
                    continue
                sub_tr = " ".join(chunk)
            else:
                sub_tr = None
            for w in self._align_words(sub, sub_tr):
                out.append(AlignedWord(w.start + t0, w.end + t0, w.word))
        return out

    def _align_words(self, audio: Audio, transcript: str | None) -> list[AlignedWord]:
        """Single-clock alignment: ≤30 s windows through the model, longer
        audio chunked with word budgets apportioned by duration (the
        reference delegates this to whisper-timestamped's chunking)."""
        window_s = self.cfg.n_audio_ctx * FRAME_DT
        dur = audio.duration_seconds
        if dur > window_s:
            words_all = transcript.split() if transcript is not None else None
            out_words: list[AlignedWord] = []
            n_chunks = int(np.ceil(dur / window_s))
            wi = 0
            for c in range(n_chunks):
                t0 = c * window_s
                sub = audio.slice_ms(t0 * 1000, min((c + 1) * window_s, dur) * 1000)
                if words_all is not None:
                    share = int(round(len(words_all) * sub.duration_seconds / dur))
                    chunk_words = words_all[wi : wi + max(share, 0)] if c < n_chunks - 1 else words_all[wi:]
                    wi += len(chunk_words)
                    sub_tr = " ".join(chunk_words)
                    if not sub_tr:
                        continue
                else:
                    sub_tr = None
                for w in self._align_words(sub, sub_tr):
                    out_words.append(AlignedWord(w.start + t0, w.end + t0, w.word))
            return out_words
        text = transcript if transcript is not None else self.transcribe(audio)
        token_ids = self.tokenizer.encode(text)[1:-1]
        # per-token surface strings with a leading space marking word starts
        # (NOT decode([t]): that strips the WordPiece "##" marker and would
        # split multi-piece words); both tokenizer families implement this
        pieces = self.tokenizer.pieces_with_boundaries(token_ids)
        mel = self.features(audio)
        ids = jnp.asarray([token_ids], jnp.int32)
        enc = self.model.apply(self.params, mel[None], method=WhisperModel.encode)
        _, cross = self.model.apply(
            self.params, ids, enc, True, method=WhisperModel.decode
        )
        n_frames = enc.shape[-2]
        spans = token_times_from_cross_attention(cross, n_frames)
        words = group_word_times(pieces, spans)
        return [AlignedWord(min(w.start, dur), min(w.end, dur), w.word) for w in words]

    def transcribe(self, audio: Audio, max_tokens: int = 128) -> str:
        if self.params is None or self.tokenizer is None:
            raise ValueError("WhisperAligner needs weights + tokenizer")
        mel = self.features(audio)
        enc = self.model.apply(self.params, mel[None], method=WhisperModel.encode)
        ids = [self.tokenizer.cls_id]
        for _ in range(max_tokens):
            logits, _ = self.model.apply(
                self.params, jnp.asarray([ids], jnp.int32), enc, False, method=WhisperModel.decode
            )
            nxt = int(jnp.argmax(logits[0, -1]))
            if nxt == self.tokenizer.sep_id:
                break
            ids.append(nxt)
        return self.tokenizer.decode(ids)
