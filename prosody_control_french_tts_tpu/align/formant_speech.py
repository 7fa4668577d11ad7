"""Narrator-domain French formant synthesizer for aligner/ASR pretraining.

``synth_speech`` builds COMPOSITIONAL audio (one fixed spectral signature
per character) — ideal for proving the alignment machinery, but its
acoustics share nothing with real French, so the packaged Whisper
hallucinated on the bundled narration (WER-proxy 1.7,
docs/real_audio_agreement_r04.json). This module attacks that domain gap
(VERDICT r4 #1) with a source-filter (Klatt-style) synthesizer driven by
the rule G2P (align/g2p_fr): glottal-harmonic excitation at the measured
narrator F0 (85–105 Hz), French formant targets per phoneme with
coarticulated transitions, burst/closure stop realisation, shaped-noise
fricatives — then a channel stage matched to the real corpus' measured
statistics (long-term spectrum peaking near 200 Hz with high-frequency
rolloff, small-room reverb, additive noise at the observed 22–34 dB SNR,
≈ −18 LUFS level). All statistics were measured with this repo's own
kernels (eval/yin, ops/energy, ops/loudness) on
/root/reference/Data/voice/records/audio.

Same contract as ``synth_speech.synth_sentence`` — (audio, word_spans[,
char_spans]) with exact gold timing — so the whole pretraining stack
(align/pretrain_whisper, align/pretrain_ctc) consumes it unchanged.

Counterpart of the reference's out-of-the-box pretrained ASR
(Code/Aligners/use_whisper_timestamped.py:92-104): weight downloads are
impossible here, so domain-matched synthesis is the hermetic route to
real-French transfer.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

from .g2p_fr import VOWELS_NASAL, VOWELS_ORAL, g2p_word_spans

SR = 16000
HOP = 80  # 5 ms frame hop
WIN = 320  # 20 ms analysis window

# ---------------------------------------------------------------------------
# phoneme inventory: French formant targets (Hz) + source parameters
# ---------------------------------------------------------------------------

# (F1, F2, F3) steady-state targets per phoneme (standard French values,
# male vocal tract — the narrator's F0 sits at 85–105 Hz)
_VOWEL_F = {
    "i": (280, 2250, 2900),
    "e": (365, 2100, 2650),
    "ɛ": (530, 1850, 2500),
    "a": (750, 1300, 2500),
    "ɔ": (540, 900, 2450),
    "o": (380, 800, 2450),
    "u": (300, 750, 2300),
    "y": (280, 1800, 2200),
    "ø": (375, 1500, 2300),
    "œ": (550, 1350, 2400),
    "ə": (500, 1450, 2450),
    "ɑ̃": (700, 1150, 2500),
    "ɛ̃": (550, 1700, 2500),
    "ɔ̃": (500, 850, 2450),
    "œ̃": (550, 1350, 2400),
}


@dataclass(frozen=True)
class _Phone:
    kind: str  # vowel | glide | nasal | liquid | fric | stop
    formants: tuple[float, float, float]
    dur: float  # seconds, before rate scaling
    voiced: float = 1.0  # voicing mix 0..1
    amp: float = 1.0
    noise_cf: float = 0.0  # frication band centre (Hz)
    noise_bw: float = 0.0
    noise_amp: float = 0.0
    burst_cf: float = 0.0  # stops only
    closure: float = 0.0  # stops only: closure duration


def _mk_phones() -> dict[str, _Phone]:
    p: dict[str, _Phone] = {}
    for v in VOWELS_ORAL:
        dur = 0.062 if v == "ə" else 0.088
        p[v] = _Phone("vowel", _VOWEL_F[v], dur)
    for v in VOWELS_NASAL:
        # nasal vowels: damped F1 region + nasal murmur → lower amplitude
        p[v] = _Phone("vowel", _VOWEL_F[v], 0.108, amp=0.85)
    p["j"] = _Phone("glide", (280, 2100, 2900), 0.048, amp=0.7)
    p["w"] = _Phone("glide", (300, 700, 2300), 0.048, amp=0.7)
    p["ɥ"] = _Phone("glide", (290, 1600, 2300), 0.048, amp=0.7)
    p["m"] = _Phone("nasal", (250, 1000, 2200), 0.068, amp=0.55)
    p["n"] = _Phone("nasal", (250, 1500, 2500), 0.068, amp=0.55)
    p["ɲ"] = _Phone("nasal", (250, 2000, 2700), 0.075, amp=0.55)
    p["l"] = _Phone("liquid", (360, 1300, 2700), 0.055, amp=0.65)
    p["ʁ"] = _Phone(
        "liquid", (520, 1100, 2400), 0.062, amp=0.55, noise_cf=1100, noise_bw=900, noise_amp=0.18
    )
    for ph, cf, bw, na, voiced in (
        ("f", 5800, 4200, 0.30, 0.0),
        ("s", 6300, 3200, 0.45, 0.0),
        ("ʃ", 3300, 2600, 0.45, 0.0),
        ("v", 5800, 4200, 0.16, 0.85),
        ("z", 6300, 3200, 0.22, 0.85),
        ("ʒ", 3300, 2600, 0.22, 0.85),
    ):
        p[ph] = _Phone(
            "fric",
            (400, 1600, 2500),
            0.078 if voiced == 0.0 else 0.066,
            voiced=voiced,
            amp=0.35 if voiced else 0.0,
            noise_cf=cf,
            noise_bw=bw,
            noise_amp=na,
        )
    for ph, burst, voiced, clo in (
        ("p", 800, 0.0, 0.055),
        ("t", 4000, 0.0, 0.055),
        ("k", 1800, 0.0, 0.060),
        ("b", 800, 1.0, 0.042),
        ("d", 4000, 1.0, 0.042),
        ("ɡ", 1800, 1.0, 0.048),
    ):
        p[ph] = _Phone(
            "stop",
            (300, 1500, 2500),
            0.016,  # burst length; closure added separately
            voiced=voiced,
            amp=0.0,
            burst_cf=burst,
            closure=clo,
        )
    return p


PHONES = _mk_phones()


@dataclass
class FormantSpec:
    """Sentence-level synthesis parameters. Per-sentence variation (F0
    base, rate, channel) is drawn from the seed inside ``synth_sentence``
    so a corpus covers the narrator's measured ranges."""

    sample_rate: int = SR
    f0: float = 95.0  # narrator median (85–105 measured via NAC/YIN)
    f0_jitter: float = 0.012
    rate: float = 1.0  # duration scale (≈13 phones/s at 1.0)
    gap_s: float = 0.055  # inter-word gap
    edge_s: float = 0.08  # leading/trailing silence
    augment: bool = True  # channel EQ + reverb + noise stage
    vary: bool = True  # draw per-sentence F0/rate/channel from the seed
    formant_scale: float = 1.0  # vocal-tract-length warp (formants ×α)


def _sentence_draws(spec: FormantSpec, rng: np.random.Generator) -> FormantSpec:
    if not spec.vary:
        return spec
    return replace(
        spec,
        f0=float(rng.uniform(85.0, 105.0)),
        rate=float(rng.uniform(0.85, 1.18)),
        gap_s=float(rng.uniform(0.04, 0.09)),
        # VTL warp: the acoustic model must not overfit ONE vocal tract —
        # ±8 % covers typical male tract-length spread around the targets
        formant_scale=float(rng.uniform(0.93, 1.09)),
    )


# ---------------------------------------------------------------------------
# segment planning: text → [(phone|None, dur_s, char_interval)] + gold spans
# ---------------------------------------------------------------------------


def _plan(text: str, spec: FormantSpec, rng: np.random.Generator):
    """Returns (segments, word_spans, char_spans). ``segments`` are
    (phone_name_or_None, dur). Gold char spans cover every character of
    ``text`` (spaces included) so pretrain_whisper's byte supervision maps
    1:1; silent letters inherit their rule-span's phone interval."""
    words = text.split()
    segments: list[tuple[str | None, float]] = [(None, spec.edge_s)]
    t = spec.edge_s
    word_spans: list[tuple[float, float, str]] = []
    char_spans: list[tuple[float, float, str]] = []
    # char cursor over the original text (to emit spans for spaces too)
    pos = 0
    for wi, word in enumerate(words):
        # preceding whitespace in the original text owns the gap interval
        n_sp = 0
        while pos + n_sp < len(text) and text[pos + n_sp] == " ":
            n_sp += 1
        gap = 0.0
        if wi > 0:
            gap = spec.gap_s * float(rng.uniform(0.8, 1.3))
            segments.append((None, gap))
        for _ in range(n_sp):
            char_spans.append((t, t + gap, " "))
        pos += n_sp
        t += gap
        spans = g2p_word_spans(word)
        norm_ok = True
        # char index → (t0, t1) over this word
        char_t: dict[int, tuple[float, float]] = {}
        w0 = t
        for ci0, ci1, phones in spans:
            if ci1 > len(word):
                norm_ok = False
                break
            seg_t0 = t
            for ph in phones:
                P = PHONES.get(ph)
                if P is None:
                    continue
                if P.kind == "stop":
                    clo = P.closure * spec.rate
                    segments.append((f"{ph}:closure", clo))
                    t += clo
                dur = P.dur * spec.rate * float(rng.uniform(0.85, 1.18))
                segments.append((ph, dur))
                t += dur
            for k in range(ci0, ci1):
                char_t[k] = (seg_t0, max(t, seg_t0))
        if not norm_ok or len(word) == 0:
            # normalization changed length (shouldn't for the corpus):
            # share the word interval across all chars
            char_t = {k: (w0, max(t, w0)) for k in range(len(word))}
        # silent-letter spans got (seg_t0 == t) zero intervals where their
        # rule emitted no phones; give them the neighbouring instant
        last = (w0, w0)
        for k in range(len(word)):
            if k in char_t and char_t[k][1] > char_t[k][0]:
                last = char_t[k]
            elif k in char_t:
                char_t[k] = (last[1], last[1])
            else:
                char_t[k] = (last[1], last[1])
        for k in range(len(word)):
            char_spans.append((char_t[k][0], char_t[k][1], word[k]))
        pos += len(word)
        if t == w0:  # no realisable phones — skip the word in gold
            continue
        word_spans.append((w0, t, word))
    # trailing whitespace
    while pos < len(text) and text[pos] == " ":
        char_spans.append((t, t, " "))
        pos += 1
    segments.append((None, spec.edge_s))
    t += spec.edge_s
    return segments, word_spans, char_spans, t


# ---------------------------------------------------------------------------
# frame-parameter tracks + synthesis
# ---------------------------------------------------------------------------


def _tracks(segments, spec: FormantSpec, n_frames: int):
    """Piecewise-constant per-frame parameter tracks, then smoothed for
    coarticulation: [F1 F2 F3 voiced amp noise_cf noise_bw noise_amp]."""
    par = np.zeros((n_frames, 8), np.float32)
    par[:, 0:3] = (500.0, 1450.0, 2450.0)  # neutral tract during silence
    frame = 0
    total = sum(d for _, d in segments)
    for name, dur in segments:
        nf = max(int(round(dur * SR / HOP)), 1)
        lo, hi = frame, min(frame + nf, n_frames)
        frame += nf
        if name is None or lo >= n_frames:
            continue
        if name.endswith(":closure"):
            P = PHONES[name.split(":")[0]]
            # voiced stops keep a low-frequency voice bar in closure
            par[lo:hi] = (180, 1200, 2400, P.voiced, 0.10 * P.voiced, 0, 0, 0)
            continue
        P = PHONES[name]
        if P.kind == "stop":
            # burst: noise at the burst locus (+ aspiration for voiceless)
            na = 0.5 if P.voiced == 0.0 else 0.35
            par[lo:hi] = (*P.formants, P.voiced * 0.3, 0.05, P.burst_cf, 1400.0, na)
            continue
        par[lo:hi] = (
            *P.formants,
            P.voiced,
            P.amp,
            P.noise_cf,
            max(P.noise_bw, 1.0),
            P.noise_amp,
        )
    # vocal-tract-length warp: formant targets and frication loci scale
    # together (columns 0-2 = F1..F3, 5 = noise centre)
    if spec.formant_scale != 1.0:
        par[:, 0:3] *= spec.formant_scale
        par[:, 5] *= spec.formant_scale
    # coarticulation: 15 ms triangular smoothing of every track
    k = np.array([1, 2, 3, 2, 1], np.float32)
    k /= k.sum()
    sm = np.empty_like(par)
    for c in range(par.shape[1]):
        sm[:, c] = np.convolve(par[:, c], k, mode="same")
    del total
    return sm


def _f0_track(par, spec: FormantSpec, rng: np.random.Generator, n_frames: int):
    """Declining F0 with word-level micro-movement and jitter (Hz per
    frame). Follows the narrator's measured register."""
    base = spec.f0
    decl = np.linspace(1.06, 0.92, n_frames)
    wob = 1.0 + 0.04 * np.sin(np.linspace(0, 9 * np.pi, n_frames) + rng.uniform(0, np.pi))
    jit = 1.0 + spec.f0_jitter * rng.standard_normal(n_frames).astype(np.float32)
    return (base * decl * wob * jit).astype(np.float32)


def _synth_from_tracks(par, f0_frames, rng: np.random.Generator) -> np.ndarray:
    n_frames = par.shape[0]
    n = n_frames * HOP + WIN
    # ---- voiced source: harmonic sum with phase accumulation ----
    f0_s = np.repeat(f0_frames, HOP)[: n].astype(np.float32)
    if f0_s.shape[0] < n:
        f0_s = np.pad(f0_s, (0, n - f0_s.shape[0]), mode="edge")
    phase = np.cumsum(2.0 * np.pi * f0_s / SR, dtype=np.float64).astype(np.float32)
    H = int(7400 // max(f0_frames.min(), 60.0))
    H = min(H, 90)
    voiced = np.zeros(n, np.float32)
    for h in range(1, H + 1):
        # glottal spectrum ≈ −12 dB/oct → 1/h²; tract adds the formants
        voiced += (1.0 / (h * h)) * np.sin(h * phase, dtype=np.float32)
    voiced *= 1.0 / np.max(np.abs(voiced) + 1e-9)
    noise = rng.standard_normal(n).astype(np.float32) * 0.5

    # ---- frame both sources, shape spectra, overlap-add ----
    win = np.hanning(WIN).astype(np.float32)
    idx = np.arange(WIN)[None, :] + HOP * np.arange(n_frames)[:, None]
    V = np.fft.rfft(voiced[idx] * win, axis=1)
    Nz = np.fft.rfft(noise[idx] * win, axis=1)
    freqs = np.fft.rfftfreq(WIN, 1.0 / SR).astype(np.float32)  # [bins]

    F = par[:, 0:3][:, :, None]  # [T, 3, 1]
    BW = np.array([90.0, 120.0, 160.0], np.float32)[None, :, None]
    # Lorentzian resonances, F1 strongest
    gains = np.array([1.0, 0.63, 0.35], np.float32)[None, :, None]
    Hmag = (gains / (1.0 + ((freqs[None, None, :] - F) / BW) ** 2)).sum(1)  # [T, bins]
    Hmag += 0.01  # spectral floor
    voic = par[:, 3:4]
    amp = par[:, 4:5]
    shaped_v = V * (Hmag * voic * amp)

    ncf = par[:, 5:6]
    nbw = np.maximum(par[:, 6:7], 1.0)
    namp = par[:, 7:8]
    Nmag = np.exp(-0.5 * ((freqs[None, :] - ncf) / nbw) ** 2) * namp
    # voiced fricatives: frication modulated by voicing is ignored (small)
    shaped_n = Nz * Nmag

    frames_out = np.fft.irfft(shaped_v + shaped_n, n=WIN, axis=1).astype(np.float32) * win
    out = np.zeros(n, np.float32)
    np.add.at(out, idx, frames_out)
    return out[: n_frames * HOP]


# ---------------------------------------------------------------------------
# channel stage — matched to the real corpus' measured statistics
# ---------------------------------------------------------------------------


def _channel(x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """EQ toward the measured narration LTAS (energy peak ≈ 200 Hz,
    ≈ −20 dB by 1.6 kHz), small-room reverb, additive noise at the
    observed 22–34 dB frame SNR, RMS levelled near the −18 LUFS corpus."""
    n = x.shape[0]
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(n, 1.0 / SR).astype(np.float32)
    # tilt: flat to ~250 Hz then rolloff (measured ~ −4.5 dB/oct ± variation)
    oct_roll = rng.uniform(-5.5, -3.0)
    tilt = np.minimum(0.0, oct_roll * np.log2(np.maximum(f, 1.0) / 250.0))
    # low-cut below 70 Hz (narration channel)
    tilt += np.minimum(0.0, 24.0 * np.log2(np.maximum(f, 1.0) / 70.0).clip(max=0.0))
    x = np.fft.irfft(X * 10.0 ** (tilt / 20.0), n=n).astype(np.float32)
    # reverb: exponentially decaying noise IR, RT60 0.15–0.35 s, D/R ≈ 10 dB
    rt = rng.uniform(0.15, 0.35)
    ir_n = int(rt * SR)
    ir = rng.standard_normal(ir_n).astype(np.float32) * np.exp(
        -6.9 * np.arange(ir_n, dtype=np.float32) / ir_n
    )
    ir[0] = 0.0
    wet = np.fft.irfft(np.fft.rfft(x, n + ir_n) * np.fft.rfft(ir, n + ir_n))[:n].astype(np.float32)
    wet_gain = 10.0 ** (-rng.uniform(8.0, 14.0) / 20.0) / (np.std(wet) / (np.std(x) + 1e-9) + 1e-9)
    x = x + wet_gain * wet
    # additive noise at the measured SNR (pink-ish)
    snr_db = rng.uniform(22.0, 34.0)
    nz = rng.standard_normal(n).astype(np.float32)
    NZ = np.fft.rfft(nz)
    NZ *= 1.0 / np.sqrt(np.maximum(f, 40.0))
    nz = np.fft.irfft(NZ, n=n).astype(np.float32)
    nz *= (np.std(x) / (np.std(nz) + 1e-9)) * 10.0 ** (-snr_db / 20.0)
    x = x + nz
    # level: RMS ≈ −20 dBFS (the corpus sits near −18 LUFS)
    x *= 10.0 ** (-20.0 / 20.0) / (np.sqrt(np.mean(np.square(x))) + 1e-9)
    return np.clip(x, -0.99, 0.99)


# ---------------------------------------------------------------------------
# public API — synth_speech.synth_sentence contract
# ---------------------------------------------------------------------------


def synth_sentence(
    text: str, spec: FormantSpec | None = None, seed: int = 0, with_chars: bool = False
):
    """text → (mono float32 16 kHz audio, gold [(t0, t1, word)] spans[,
    gold per-character spans — every char of ``text`` incl. spaces])."""
    spec = spec or FormantSpec()
    rng = np.random.default_rng(seed)
    s = _sentence_draws(spec, rng)
    segments, word_spans, char_spans, total = _plan(text, s, rng)
    n_frames = int(np.ceil(total * SR / HOP))
    par = _tracks(segments, s, n_frames)
    f0 = _f0_track(par, s, rng, n_frames)
    x = _synth_from_tracks(par, f0, rng)
    want = int(np.ceil(total * SR))
    if x.shape[0] < want:
        x = np.pad(x, (0, want - x.shape[0]))
    x = x[:want]
    if s.augment:
        x = _channel(x, rng)
    else:
        x *= 0.3 / (np.max(np.abs(x)) + 1e-9)
    if with_chars:
        return x, word_spans, char_spans
    return x, word_spans
