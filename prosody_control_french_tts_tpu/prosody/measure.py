"""Batched prosody measurement: one device program per voice corpus.

The reference's measure step re-opens every wav file once per syntagme and
runs Praat/pyloudnorm per slice (Code/audioPipeline.py:496-537 — flagged in
SURVEY.md §6 as the dominant CPU cost). Here the whole voice is loaded into
two padded arrays (natural [S, T], raw synthetic [S, T2]) and a single
jitted program computes:

- the full F0 track of every segment (batched Boersma kernel) and the
  voiced median inside every syntagme window;
- K-weighted loudness with per-window peak normalisation and BS.1770
  gating for every syntagme window of both corpora, with the reference's
  short-window fallback (→ full-file loudness);
- full-segment pitch/loudness for the sliding-window baselines.

Durations, word counts and clamping/smoothing run on flat [rows] arrays
(prosody.adjust). Host work is only file I/O, TextGrid parsing, and
syntagme bookkeeping.

Lengths are padded to power-of-two buckets so XLA compiles once per bucket,
not once per segment length.
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.loudness import k_weight, windowed_loudness, max_blocks_for, _gated_lufs  # noqa: F401
from ..ops.pitch import PitchParams, _pitch_frames, _geometry, median_pitch_in_windows, PitchTrack, viterbi_batched
from ..ops import pcm
from ..ops.rangemax import RangeMax
from ..ssml.syntagme import Syntagme, extract_words_and_pauses, pipeline_syntagmes
from ..utils import fr_pos
from ..utils.textgridio import read_textgrid

log = logging.getLogger(__name__)
from ..utils.wavio import read_wav
from .adjust import ProsodySettings, pitch_adjust_pct, rate_adjust_pct, segment_baselines, volume_adjust_pct


def bucket_length(n: int, minimum: int = 1 << 15) -> int:
    """Next (2^k − 8192) ≥ n (≥ minimum): bounds the number of distinct
    compiled shapes for a corpus of ragged segments, and leaves exactly the
    K-weighting filter's 8192-sample decay pad so the loudness FFT lands on
    a power of two instead of the next one up (halves that FFT)."""
    m = minimum
    while m - 8192 < n:
        m *= 2
    return m - 8192


_SEG_NUM = re.compile(r"segment_ph(\d+)")


def segment_sort_key(p: Path):
    m = _SEG_NUM.search(p.stem)
    return (0, int(m.group(1))) if m else (1, p.stem)


@dataclass
class MeasureRow:
    segment: str
    syntagme: str
    pause: int
    raw_pitch: float
    raw_volume: float
    raw_rate: float
    pitch_smooth: float = 0.0
    rate_smooth: float = 0.0


@dataclass
class SegmentStat:
    segment: str
    p_nat: float
    l_nat: float
    l_syn: float
    d_nat: float
    d_syn: float
    wc: int
    rate_ratio: float


@dataclass
class MeasureResult:
    rows: list[MeasureRow]
    seg_stats: list[SegmentStat]
    baselines: dict[str, np.ndarray] = field(default_factory=dict)


# ---------------------------------------------------------------------------
# device kernel
# ---------------------------------------------------------------------------


def _pitch_part(nat, nat_len, win_nat, mask, rate: float, T: int, pp: PitchParams):
    """Traced natural-side pitch: Boersma frames + Viterbi + windowed
    medians. Returns (p_syn [S,N], p_seg [S])."""
    g = _geometry(T, rate, pp)

    freq, strength, intensity, _ = jax.vmap(
        lambda sig, length: _pitch_frames(sig, rate, T, pp, length)
    )(nat, nat_len.astype(jnp.float32))
    f0 = viterbi_batched(freq, strength, intensity, pp, g["dt"])  # [S, F]
    times = g["first_time"] + np.arange(g["n_frames"]) * g["dt"]  # host constants

    # syntagme-window pitch medians (seconds)
    win_s = win_nat.astype(jnp.float32) / rate
    track = PitchTrack(f0=f0, times=times, dt=g["dt"])
    p_syn = median_pitch_in_windows(track, win_s, mask)  # [S, N]
    # full-segment median
    full_win = jnp.stack([jnp.zeros_like(nat_len), nat_len], axis=-1).astype(jnp.float32) / rate
    p_seg = median_pitch_in_windows(track, full_win[:, None, :])[:, 0]
    return p_syn, p_seg


def _lufs_part(x, x_len, wins, rate: float, max_t: int):
    """Traced windowed gated LUFS with the full-file fallback column."""
    y = k_weight(x, rate, num_samples=max_t)
    rmax = RangeMax.build(x)
    # append the full-file window (the short-syntagme fallback target)
    # as one extra column so ONE windowed_loudness call — and thus one
    # chunked-cumsum build over the signal — serves both
    fw = jnp.stack([jnp.zeros_like(x_len), x_len], axis=-1)[:, None, :]
    wins_ext = jnp.concatenate([wins, fw], axis=1)  # [S, N+1, 2]
    peaks = rmax.query(wins_ext[..., 0], wins_ext[..., 1])
    peaks = jnp.where(peaks > 0, peaks, 1.0)  # reference `or 1.0`
    mb = max_blocks_for(max_t, rate)
    lufs_ext, valid_ext = windowed_loudness(
        y, rate, wins_ext[..., 0], wins_ext[..., 1], peaks, max_blocks=mb
    )
    flufs = jnp.where(valid_ext[:, -1], lufs_ext[:, -1], -70.0)
    out = jnp.where(valid_ext[:, :-1], lufs_ext[:, :-1], flufs[:, None])
    return out, flufs


@partial(jax.jit, static_argnames=("rate", "T", "T2", "pp"))
def _measure_device(
    nat, nat_len, raw, raw_len, win_nat, win_raw, mask, rate: float, T: int, T2: int, pp: PitchParams
):
    """nat [S,T], raw [S,T2] float32 — or int16 when the host proved the
    f32 corpus is an exact int16 image (_load_padded): the device-side
    cast is then lossless and the host→device transfer halves, which is
    the dominant cost of the measure step on remote runtimes (~40 MB/s
    tunnel). win_* [S,N,2] int32 sample windows (win_raw pre-adjusted for
    the empty-slice fallback); mask [S,N].

    Returns per-syntagme (median F0 nat, LUFS nat, LUFS raw, valid flags)
    and per-segment (median F0, LUFS nat full, LUFS raw full).
    """
    if nat.dtype == jnp.int16:
        nat = pcm.i16_to_f32(nat)
    if raw.dtype == jnp.int16:
        raw = pcm.i16_to_f32(raw)
    p_syn, p_seg = _pitch_part(nat, nat_len, win_nat, mask, rate, T, pp)

    if T == T2:
        # one batched pass over both corpora halves the FFT/cumsum launches
        both_syn, both_seg = _lufs_part(
            jnp.concatenate([nat, raw], axis=0),
            jnp.concatenate([nat_len, raw_len], axis=0),
            jnp.concatenate([win_nat, win_raw], axis=0),
            rate,
            T,
        )
        S = nat.shape[0]
        l_nat_syn, l_raw_syn = both_syn[:S], both_syn[S:]
        l_nat_seg, l_raw_seg = both_seg[:S], both_seg[S:]
    else:
        l_nat_syn, l_nat_seg = _lufs_part(nat, nat_len, win_nat, rate, T)
        l_raw_syn, l_raw_seg = _lufs_part(raw, raw_len, win_raw, rate, T2)
    return p_syn, p_seg, l_nat_syn, l_nat_seg, l_raw_syn, l_raw_seg


def _pack6(outs):
    """Traced: pack the six measure outputs into ONE [S, 3N+3] f32 buffer.

    Each device→host read costs a full tunnel roundtrip (~30 ms) on remote
    runtimes regardless of size — six separate KB-sized reads were ~150 ms
    of pure latency per voice in the e2e phase table. One buffer = one
    read. Column layout: [p_syn | p_seg | l_nat_syn | l_nat_seg |
    l_raw_syn | l_raw_seg]."""
    p_syn, p_seg, l_nat_syn, l_nat_seg, l_raw_syn, l_raw_seg = outs
    return jnp.concatenate(
        [p_syn, p_seg[:, None], l_nat_syn, l_nat_seg[:, None], l_raw_syn, l_raw_seg[:, None]],
        axis=1,
    )


def _unpack6(arr: np.ndarray):
    """Host: inverse of _pack6. arr [S, 3N+3] → the six output arrays."""
    n = (arr.shape[1] - 3) // 3
    return (
        arr[:, :n],
        arr[:, n],
        arr[:, n + 1 : 2 * n + 1],
        arr[:, 2 * n + 1],
        arr[:, 2 * n + 2 : 3 * n + 2],
        arr[:, 3 * n + 2],
    )


@partial(jax.jit, static_argnames=("rate", "T", "T2", "pp"))
def _measure_device_packed(
    nat, nat_len, raw, raw_len, win_nat, win_raw, mask, rate: float, T: int, T2: int, pp: PitchParams
):
    return _pack6(
        _measure_device(nat, nat_len, raw, raw_len, win_nat, win_raw, mask, rate=rate, T=T, T2=T2, pp=pp)
    )


@partial(jax.jit, static_argnames=("rate", "T", "pp"))
def _measure_nat_device(nat, nat_len, win_nat, mask, rate: float, T: int, pp: PitchParams):
    """Natural-side half of _measure_device (pitch + nat LUFS) as its own
    program: the single-voice path launches it FIRST so it executes while
    the raw corpus is still streaming host→device in the background — on
    remote runtimes the raw upload otherwise sits on the measure critical
    path (raw synthesis finishes immediately before measure, so there is
    no host work left to hide it behind)."""
    if nat.dtype == jnp.int16:
        nat = pcm.i16_to_f32(nat)
    p_syn, p_seg = _pitch_part(nat, nat_len, win_nat, mask, rate, T, pp)
    l_nat_syn, l_nat_seg = _lufs_part(nat, nat_len, win_nat, rate, T)
    return p_syn, p_seg, l_nat_syn, l_nat_seg


@partial(jax.jit, static_argnames=("rate", "T2"))
def _measure_raw_device(raw, raw_len, win_raw, rate: float, T2: int):
    """Raw-side half of _measure_device (raw LUFS only — no pitch)."""
    if raw.dtype == jnp.int16:
        raw = pcm.i16_to_f32(raw)
    return _lufs_part(raw, raw_len, win_raw, rate, T2)


@partial(jax.jit, static_argnames=("rate", "T", "pp"))
def _measure_nat_packed(nat, nat_len, win_nat, mask, rate: float, T: int, pp: PitchParams):
    """_measure_nat_device with its four outputs packed into one
    [S, 2N+2] buffer (see _pack6 rationale: one d2h read per program)."""
    p_syn, p_seg, l_syn, l_seg = _measure_nat_device(nat, nat_len, win_nat, mask, rate, T, pp)
    return jnp.concatenate([p_syn, p_seg[:, None], l_syn, l_seg[:, None]], axis=1)


@partial(jax.jit, static_argnames=("rate", "T2"))
def _measure_raw_packed(raw, raw_len, win_raw, rate: float, T2: int):
    """_measure_raw_device packed into one [S, N+1] buffer."""
    l_syn, l_seg = _measure_raw_device(raw, raw_len, win_raw, rate, T2)
    return jnp.concatenate([l_syn, l_seg[:, None]], axis=1)


@partial(jax.jit, static_argnames=("t",))
def _unpack_rows(flat, offs, lens, t: int):
    """[total≲S·t] compact row storage → [S, t] padded batch (row i =
    flat[offs[i] : offs[i]+lens[i]] then zeros). One memory-bound gather;
    offsets/lengths are runtime args so the compiled program is reused
    across corpora that share (S, t, flat bucket)."""
    pos = jnp.arange(t, dtype=jnp.int32)[None, :]
    valid = pos < lens[:, None]
    idx = jnp.where(valid, offs[:, None] + pos, 0)
    return jnp.where(valid, flat[idx], jnp.zeros((), flat.dtype))


def _audio_to_device(a: np.ndarray, lens) -> jnp.ndarray:
    """device_put of a padded [S, T] corpus that TRANSFERS only the real
    samples: rows are packed end-to-end on the host (memcpy), streamed
    compactly, and re-expanded to the padded layout by one on-device
    gather — bit-identical to device_put(a) (rows beyond lens are zero in
    both). On remote runtimes the h2d link is the measure step's floor
    (~40 MB/s tunnel), and voice-max padding inflates the bundled corpus
    ~2.8×, so this is a direct wall-clock cut. Falls back to a plain put
    when padding is small (< 4/3) or the layout doesn't qualify."""
    if a.ndim != 2:
        return jnp.asarray(a)
    S, T = a.shape
    ln = np.asarray(lens, np.int64)
    if ln.shape != (S,) or (ln < 0).any() or (ln > T).any():
        return jnp.asarray(a)
    total = int(ln.sum())
    if total == 0 or total > (3 * S * T) // 4 or total + T > 2**31 - 1:
        return jnp.asarray(a)
    flat_t = max(bucket_length(total), 1)
    flat = np.zeros(flat_t, a.dtype)
    offs = np.zeros(S, np.int32)
    o = 0
    for i in range(S):
        n = int(ln[i])
        flat[o : o + n] = a[i, :n]
        offs[i] = o
        o += n
    return _unpack_rows(
        jax.device_put(flat), jax.device_put(offs), jax.device_put(ln.astype(np.int32)), T
    )


def _corpus_to_device(args7, pre=None, lens=None):
    """Place one bucket's 7 [S, …] arrays on device. Single device:
    plain jnp.asarray — except the big audio batches, which stream
    compactly when ``lens`` provides their per-row real lengths
    (_audio_to_device). Multi-device (parallel.mesh.production_data_mesh —
    all chips on an accelerator, env-opt-in elsewhere): pad the batch axis
    to the data-axis size and shard it P("data") — _measure_device is pure
    vmap over S, so GSPMD partitions every kernel with no collectives and
    per-row results are unchanged (tests/test_production_mesh.py asserts
    parity). Padded rows are zero signals → all-unvoiced, masked windows;
    callers slice real rows by offset so pad rows are never read.

    pre: optional per-slot already-on-device buffers (prefetch_corpus) —
    used verbatim; they were placed by this same function, so sharding and
    batch padding match. lens: optional per-slot [S] real row lengths
    (audio slots only; None → plain put)."""
    from ..parallel.mesh import production_data_mesh

    mesh = production_data_mesh()

    def pre_ok(i, a, rows):
        """A prefetched buffer is reused only if its shape still matches
        what this call would produce — the mesh/device config can change
        between prefetch and consume (PCFT_DATA_MESH, test harnesses), and
        a stale row count would shape-error inside the measure jit."""
        if pre is None or pre[i] is None:
            return False
        exp = (rows,) + tuple(np.shape(a)[1:])
        if tuple(pre[i].shape) == exp:
            return True
        log.debug("prefetched corpus shape %s != expected %s; reloading", pre[i].shape, exp)
        return False

    if mesh is None:
        return [
            (
                pre[i]
                if pre_ok(i, a, np.shape(a)[0] if np.ndim(a) else 0)
                else (
                    _audio_to_device(np.asarray(a), lens[i])
                    if lens is not None and lens[i] is not None and isinstance(a, np.ndarray)
                    else jnp.asarray(a)
                )
            )
            for i, a in enumerate(args7)
        ]
    from jax.sharding import NamedSharding, PartitionSpec as P

    nd = mesh.shape["data"]
    sh = NamedSharding(mesh, P("data"))
    out = []
    for i, a in enumerate(args7):
        S = int(np.shape(a)[0]) if np.ndim(a) else 0
        Sp = ((S + nd - 1) // nd) * nd
        if pre_ok(i, a, Sp):
            out.append(pre[i])
            continue
        a = np.asarray(a)
        if Sp != S:
            a = np.pad(a, [(0, Sp - S)] + [(0, 0)] * (a.ndim - 1))
        out.append(jax.device_put(a, sh))
    return out


_FUSED_CACHE: dict = {}


def measure_buckets_fused(arg_sets, statics):
    """ONE device dispatch for several length buckets.

    arg_sets: list of 7-tuples (nat, nat_len, raw, raw_len, win_nat,
    win_raw, mask); statics: matching list of (rate, T, T2, pp).

    Per-bucket dispatch is the right shape on a local chip (launches cost
    ~50 µs and overlap), but on remote runtimes every executable launch is
    a network round trip (~30 ms measured on the v5e tunnel) and launches
    do NOT overlap — an N-bucket corpus pays N floors. Fusing the buckets
    into one XLA program pays the launch once; XLA schedules the
    per-bucket subgraphs back-to-back on device.

    Returns (outs, checksum): outs is a tuple of per-bucket 6-tuples
    (the _measure_device outputs), checksum a scalar that depends on every
    output — reading it forces the whole program (on this runtime,
    block_until_ready does not force execution of unconsumed results;
    see CLAUDE.md).
    """
    key = tuple(statics)
    fn = _FUSED_CACHE.get(key)
    if fn is None:

        def impl(*flat):
            outs = []
            for i, (rate, T, T2, pp) in enumerate(key):
                outs.append(_measure_device(*flat[7 * i : 7 * i + 7], rate=rate, T=T, T2=T2, pp=pp))
            checksum = sum(jnp.sum(jnp.nan_to_num(o, posinf=1.0, neginf=-1.0)) for out in outs for o in out)
            return tuple(outs), checksum

        fn = jax.jit(impl)
        _FUSED_CACHE[key] = fn
    flat = [x for s in arg_sets for x in _corpus_to_device(list(s))]
    return fn(*flat)


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------


# --- corpus prefetch -------------------------------------------------------
# On remote/tunneled runtimes, h2d transfers progress in the BACKGROUND while
# the host works (measured on the v5e tunnel: a 21 MB corpus consumed 30×
# faster after 3 s of unrelated host work). Pipeline steps call
# prefetch_corpus() the moment a corpus exists on disk — the transfer then
# streams behind the intervening host steps (align, raw-synth CSV work) and
# the measure stage finds both the host arrays and the already-resident
# device buffer here instead of paying the full transfer on its critical
# path. Entries are keyed by (path, mtime, size) so rewritten files miss.
_PREFETCH: dict = {}
# sized for a multi-voice batch: 2 corpora per voice × 8 voices ≈ 350 MB of
# device-resident int16 images on a 16 GB chip
_PREFETCH_CAP = 16


def _host_cpu_device():
    """The local CPU jax device (for launch-overhead-dominated tiny ops);
    falls back to the default device if no CPU backend is registered —
    loudly, because the fallback silently re-introduces the ~30 ms/launch
    remote-dispatch cost this pin exists to remove (set
    JAX_PLATFORMS=<accel>,cpu to restore it)."""
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        log.warning(
            "no CPU jax backend registered; tiny adjustment ops will run on "
            "the default device (remote launch overhead applies)"
        )
        return jax.devices()[0]


def _corpus_key(paths, rate_expect):
    items = []
    for p in paths:
        if p is None:
            items.append(None)
            continue
        try:
            st = Path(p).stat()
        except OSError:
            items.append((str(p), -1, -1))
            continue
        items.append((str(p), st.st_mtime_ns, st.st_size))
    return (tuple(items), int(rate_expect or 0))


# per-SEGMENT device rows, uploaded one at a time as synthesis loops write
# each wav: the whole-corpus prefetch can only start after the LAST file
# exists, which on the raw-synthesis→measure edge leaves the entire upload
# on measure's critical path (measured as 96 % of the measure step in the
# round-3 e2e breakdown). Keyed like _PREFETCH by (path, mtime, size, rate);
# values are (n_samples, bucketed 1-D int16 device row).
_SEG_PREFETCH: dict = {}
_SEG_PREFETCH_CAP = 64


def prefetch_segment(path, rate_expect=None) -> None:
    """Begin the async device upload of ONE wav's samples. Call from a
    synthesis loop right after each file is written: the transfer streams
    behind the synthesis of the remaining segments, and prefetch_corpus
    then assembles the padded corpus batch ON DEVICE from the resident
    rows — no h2d bytes left on the measure critical path.

    int16-lossless mono PCM only (the synthesis output format); anything
    else silently skips — the corpus falls back to the normal compact
    streaming upload."""
    try:
        from ..utils.native_audio import available, load_batch_i16
        from ..utils.wavio import wav_info

        if not available():
            return
        key = _corpus_key([path], rate_expect)
        if key in _SEG_PREFETCH:
            return
        frames, file_rate = wav_info(path)
        target = int(rate_expect or file_rate)
        if not target or file_rate != target:
            return  # resampling is a float path; not losslessly assemblable
        res = load_batch_i16([path], stride=bucket_length(frames), target_rate=target)
        if res is None:
            return
        row, lens, _ = res
        while len(_SEG_PREFETCH) >= _SEG_PREFETCH_CAP:
            _SEG_PREFETCH.pop(next(iter(_SEG_PREFETCH)))
        _SEG_PREFETCH[key] = (int(lens[0]), jax.device_put(row[0]))
    except Exception:  # noqa: BLE001 — prefetch is speculative, never fatal
        log.debug("segment prefetch failed; corpus path will upload", exc_info=True)


@partial(jax.jit, static_argnames=("t",))
def _stack_rows(rows, t: int):
    """tuple of 1-D bucketed device rows → [S, t] padded batch (each row
    zero past its real length already — the native loader zero-fills to
    its stride, and buckets only ever grow toward t)."""
    return jnp.stack([jnp.pad(r, (0, t - r.shape[0])) for r in rows])


def _assemble_from_segments(paths, host, rate_expect):
    """[S, T] device corpus from per-segment resident rows (zero h2d).
    Returns None unless every row was prefetched by prefetch_segment AND
    bit-compatibility with the host load is provable: same int16 dtype and
    per-row lengths (same loader, same target rate → same bytes)."""
    from ..parallel.mesh import production_data_mesh

    if production_data_mesh() is not None:
        return None  # sharded uploads take the _corpus_to_device path
    batch, lens, _rate, _ok = host
    if batch.dtype != np.int16:
        return None
    rows = []
    for p, n in zip(paths, lens):
        hit = _SEG_PREFETCH.get(_corpus_key([p], rate_expect))
        if hit is None or hit[0] != int(n) or hit[1].dtype != jnp.int16:
            return None
        rows.append(hit[1])
    T = batch.shape[1]
    if any(r.shape[0] > T for r in rows):
        return None
    return _stack_rows(tuple(rows), T)


def prefetch_corpus(paths, rate_expect=None) -> None:
    """Load a wav corpus and begin its (async) device transfer; no-op on
    repeat calls for unchanged files. Safe to call speculatively — a miss
    at measure time just means the normal synchronous upload. When every
    segment is already device-resident (prefetch_segment), the padded
    batch is assembled on device instead of re-uploaded."""
    paths = list(paths)
    try:
        key = _corpus_key(paths, rate_expect)
        if key in _PREFETCH:
            return
        host = _load_padded(paths, rate_expect=rate_expect)
        dev = _assemble_from_segments(paths, host, rate_expect)
        if dev is None:
            dev = _corpus_to_device([host[0]], lens=[host[1]])[0]
        while len(_PREFETCH) >= _PREFETCH_CAP:
            _PREFETCH.pop(next(iter(_PREFETCH)))
        _PREFETCH[key] = (host, dev)
    except Exception:  # noqa: BLE001 — prefetch is speculative, never fatal
        log.debug("corpus prefetch failed; measure will load synchronously", exc_info=True)


def _load_padded_cached(paths, rate_expect=None):
    """(batch, lens, rate, ok, device_buffer_or_None) — prefetch-aware."""
    key = _corpus_key(list(paths), rate_expect)
    hit = _PREFETCH.get(key)
    if hit is not None:
        (batch, lens, rate, ok), dev = hit
        return batch, lens, rate, ok, dev
    batch, lens, rate, ok = _load_padded(paths, rate_expect=rate_expect)
    return batch, lens, rate, ok, None


def _load_padded(paths_or_arrays, rate_expect=None):
    """Read wavs (or accept arrays) → ([S, T] float32 padded, lengths, rate,
    ok-flags). Uses the native C++ batch loader when available and all
    inputs are paths (utils.native_audio; pure-Python fallback otherwise)."""
    items = list(paths_or_arrays)
    if items and all(isinstance(p, (str, Path)) and p is not None for p in items):
        try:
            from ..utils.native_audio import available, load_batch, load_batch_i16
            from ..utils.wavio import wav_info

            if available():
                sizes, rates = [], []
                for p in items:
                    try:
                        frames, file_rate = wav_info(p)  # header-only probe
                    except (FileNotFoundError, ValueError, OSError):
                        frames, file_rate = 1, 0
                    sizes.append(frames)
                    rates.append(file_rate)
                valid_rates = [r for r in rates if r > 0]
                # always pin an explicit target rate: mixed-rate corpora must
                # be resampled to ONE rate (target_rate=0 would leave them
                # unresampled while reporting the first file's rate), and the
                # stride must be sized in *output* samples — the C loader
                # resamples before clipping to stride, so header counts at a
                # lower native rate would silently truncate upsampled audio
                target = int(rate_expect or (valid_rates[0] if valid_rates else 0))
                if target:
                    sizes = [
                        int(np.ceil(f * target / r)) if r and r != target else f
                        for f, r in zip(sizes, rates)
                    ]
                T = bucket_length(max(sizes))
                # lossless int16 fast path: mono PCM16 at the target rate is
                # memcpy'd by the C loader — no float decode, no host-side
                # exactness verification (the format guarantees it)
                res16 = load_batch_i16(items, stride=T, target_rate=target)
                if res16 is not None:
                    batch, lens, rate = res16
                    return batch, lens.astype(np.int32), rate, np.asarray(lens > 0)
                res = load_batch(items, stride=T, target_rate=target)
                if res is not None:
                    batch, lens, rate = res
                    ok = lens > 0
                    return _as_int16_if_lossless(batch), lens.astype(np.int32), rate, np.asarray(ok)
        except Exception:  # noqa: BLE001 — fall back to the python path
            pass

    sigs, ok = [], []
    rate = rate_expect
    for item in items:
        if item is None:
            sigs.append(np.zeros(1, np.float32))
            ok.append(False)
            continue
        if isinstance(item, (str, Path)):
            try:
                a = read_wav(item).to_mono()
            except (FileNotFoundError, ValueError):
                sigs.append(np.zeros(1, np.float32))
                ok.append(False)
                continue
            if rate is None:
                rate = a.rate
            elif a.rate != rate:
                # e.g. a TTS backend configured for a different output
                # format than the natural corpus
                from ..utils.wavio import resample as _resample

                a = _resample(a, rate)
            sigs.append(np.asarray(a.samples, np.float32))
        else:
            sigs.append(np.asarray(item, np.float32))
        ok.append(True)
    T = bucket_length(max(s.shape[0] for s in sigs))
    out = np.zeros((len(sigs), T), np.float32)
    lens = np.zeros(len(sigs), np.int32)
    for i, s in enumerate(sigs):
        out[i, : s.shape[0]] = s
        lens[i] = s.shape[0]
    return _as_int16_if_lossless(out), lens, rate or 44100, np.asarray(ok)


def _as_int16_if_lossless(out: np.ndarray) -> np.ndarray:
    """Return an int16 image of the corpus when the conversion is EXACT
    (wav-sourced audio decoded from int16 PCM always is) — the device casts
    back (_measure_device), so results are bit-identical while the
    host→device transfer halves. Resampled/synthetic float audio that
    doesn't round-trip stays float32."""
    q = pcm.f32_to_i16_exact(out)
    return out if q is None else q


def _ms_to_samp(ms: float, rate: int) -> int:
    return int(ms * rate / 1000.0)


@dataclass
class PreparedVoice:
    """Host-side arrays for one voice, ready for the device program."""

    names: list
    raw_seqs: list
    synts_per_seg: list
    nat: np.ndarray
    nat_len: np.ndarray
    rate: int
    raw_ok: np.ndarray
    raw_len: np.ndarray
    raw_for_device: np.ndarray
    raw_len_dev: np.ndarray
    win_nat: np.ndarray
    win_raw: np.ndarray
    win_raw_dev: np.ndarray
    mask: np.ndarray
    raw_slice_empty: np.ndarray
    # already-on-device images of nat / raw_for_device from prefetch_corpus
    # (None → run_measure_device uploads synchronously); only set when the
    # host array was used verbatim (no dtype promotion, no fallback rewrite)
    nat_dev: object = None
    raw_dev: object = None


def prepare_voice(
    seg_files: list[Path],
    textgrid_dir: Path,
    raw_audio_dir: Path,
    settings: ProsodySettings,
    clean_word=None,
    pos_of_factory=None,
) -> PreparedVoice:
    """Everything before the device call: TextGrid parsing, syntagme
    construction, padded corpus loading, window/fallback bookkeeping."""
    from ..core.profiling import phase

    if clean_word is None:
        clean_word = fr_pos.remove_spurious_commas

    # --- host: parse alignment, build syntagmes --------------------------
    names = [p.stem for p in seg_files]
    with phase("measure/prepare/textgrids"):
        tgs = [read_textgrid(textgrid_dir / f"{n}.TextGrid") for n in names]
        raw_seqs = [extract_words_and_pauses(tg) for tg in tgs]
        synts_per_seg: list[list[Syntagme]] = [
            pipeline_syntagmes(
                tg,
                settings.end_punctuation_pause_ms,
                clean_word=clean_word,
                pos_of_factory=pos_of_factory,
            )
            for tg in tgs
        ]

    with phase("measure/prepare/load_nat"):
        nat, nat_len, rate, _, nat_dev = _load_padded_cached(seg_files)
    raw_paths = [raw_audio_dir / f"{n}.wav" for n in names]
    with phase("measure/prepare/load_raw"):
        raw, raw_len, _, raw_ok, raw_dev = _load_padded_cached(
            [p if p.exists() else None for p in raw_paths], rate_expect=rate
        )
    if nat.dtype != raw.dtype:
        # int16 transfer images must never mix with float32 (numpy would
        # splice unscaled int16 values); promote whichever side is int16
        if nat.dtype == np.int16:
            nat = pcm.i16_to_f32(nat)
            nat_dev = None  # prefetched int16 image no longer matches
        if raw.dtype == np.int16:
            raw = pcm.i16_to_f32(raw)
            raw_dev = None

    S = len(names)
    N = max(1, max(len(s) for s in synts_per_seg))
    N = ((N + 15) // 16) * 16  # bucket the syntagme axis too
    win_nat = np.zeros((S, N, 2), np.int32)
    win_raw = np.zeros((S, N, 2), np.int32)
    mask = np.zeros((S, N), bool)
    raw_slice_empty = np.zeros((S, N), bool)

    for i, synts in enumerate(synts_per_seg):
        for j, syn in enumerate(synts):
            i0 = _ms_to_samp(syn.start_ms, rate)
            i1 = _ms_to_samp(syn.end_ms, rate)
            i0n, i1n = min(i0, int(nat_len[i])), min(i1, int(nat_len[i]))
            win_nat[i, j] = (i0n, max(i1n, i0n))
            # raw slice at natural times; empty → whole raw file
            r0, r1 = min(i0, int(raw_len[i])), min(i1, int(raw_len[i]))
            if r1 <= r0 or not raw_ok[i]:
                raw_slice_empty[i, j] = True
                win_raw[i, j] = (0, int(raw_len[i]))
            else:
                win_raw[i, j] = (r0, r1)
            mask[i, j] = True

    # when the raw file is missing entirely, the reference falls back to
    # the *natural* slice (Code/audioPipeline.py:506-509): point the raw
    # windows at the natural signal by swapping inputs per segment
    # alias (don't copy) when no fallback rewrite happens: keeps the
    # prefetched device image valid, and the array is never mutated below
    raw_for_device = raw if raw_ok.all() else raw.copy()
    raw_len_dev = raw_len.copy()
    win_raw_dev = win_raw.copy()
    T2 = raw.shape[1]
    if (~raw_ok).any():
        raw_dev = None  # fallback rewrite invalidates the prefetched image
        need = nat.shape[1] > T2
        if need:
            raw_for_device = np.zeros((S, nat.shape[1]), raw.dtype)
            raw_for_device[:, :T2] = raw
            T2 = nat.shape[1]
        for i in range(S):
            if not raw_ok[i]:
                raw_for_device[i, : int(nat_len[i])] = nat[i, : int(nat_len[i])]
                raw_for_device[i, int(nat_len[i]) :] = 0.0
                raw_len_dev[i] = nat_len[i]
                win_raw_dev[i] = win_nat[i]

    return PreparedVoice(
        names=names,
        raw_seqs=raw_seqs,
        synts_per_seg=synts_per_seg,
        nat=nat,
        nat_len=nat_len,
        rate=rate,
        raw_ok=raw_ok,
        raw_len=raw_len,
        raw_for_device=raw_for_device,
        raw_len_dev=raw_len_dev,
        win_nat=win_nat,
        win_raw=win_raw,
        win_raw_dev=win_raw_dev,
        mask=mask,
        raw_slice_empty=raw_slice_empty,
        nat_dev=nat_dev,
        raw_dev=raw_dev,
    )


def run_measure_device(prep: PreparedVoice, pp: PitchParams):
    """Single-voice dispatch: TWO programs (nat-side pitch+LUFS, then
    raw-side LUFS) instead of one. The raw corpus upload usually starts
    only moments before measure (raw synthesis is the preceding step), so
    the nat program — whose corpus was prefetched steps earlier — executes
    while the raw bytes are still streaming; the raw program queues behind
    it and finds its input resident. Per-row numerics are those of
    _measure_device's separate-LUFS branch (same traced parts)."""
    from ..core.profiling import phase

    S = prep.nat.shape[0]
    with phase("measure/device/to_device"):
        dev = _corpus_to_device(
            [prep.nat, prep.nat_len, prep.raw_for_device, prep.raw_len_dev,
             prep.win_nat, prep.win_raw_dev, prep.mask],
            pre=[prep.nat_dev, None, prep.raw_dev, None, None, None, None],
            lens=[prep.nat_len, None, prep.raw_len_dev, None, None, None, None],
        )
    with phase("measure/device/launch"):
        nat, nat_len, raw, raw_len, win_nat, win_raw, mask = dev
        nat_pk = _measure_nat_packed(
            nat, nat_len, win_nat, mask, rate=float(prep.rate), T=int(prep.nat.shape[1]), pp=pp
        )
        raw_pk = _measure_raw_packed(
            raw, raw_len, win_raw, rate=float(prep.rate), T2=int(prep.raw_for_device.shape[1])
        )
    # The outputs are per-syntagme/per-segment scalars — a few KB total —
    # so "drain" ≠ readback volume; each program packs them into ONE buffer
    # because every d2h read costs a tunnel roundtrip (~30 ms) regardless
    # of size. Split the blocking point honestly: `wait` reads the
    # LAST-queued program's buffer (launches execute in dispatch order, so
    # this forces BOTH programs; block_until_ready does not force
    # unconsumed results on this runtime), `drain` is the one remaining
    # read.
    with phase("measure/device/wait"):
        raw_np = np.asarray(raw_pk)
    with phase("measure/device/drain"):
        nat_np = np.asarray(nat_pk)
    N = prep.win_nat.shape[1]
    return (
        nat_np[:S, :N],            # p_syn
        nat_np[:S, N],             # p_seg
        nat_np[:S, N + 1 : 2 * N + 1],  # l_nat_syn
        nat_np[:S, 2 * N + 1],     # l_nat_seg
        raw_np[:S, :N],            # l_raw_syn
        raw_np[:S, N],             # l_raw_seg
    )


def postprocess_voice(prep: PreparedVoice, outputs, settings: ProsodySettings) -> MeasureResult:
    """Segment stats, baselines, adjustments, smoothing — all host/flat-jnp
    math downstream of the device outputs."""
    p_syn, p_seg, l_nat_syn, l_nat_seg, l_raw_syn, l_raw_seg = outputs
    names = prep.names
    raw_seqs = prep.raw_seqs
    synts_per_seg = prep.synts_per_seg
    nat_len, raw_len, raw_ok, rate = prep.nat_len, prep.raw_len, prep.raw_ok, prep.rate
    win_nat, win_raw, win_raw_dev = prep.win_nat, prep.win_raw, prep.win_raw_dev
    raw_slice_empty = prep.raw_slice_empty

    # --- segment stats + baselines (Code/audioPipeline.py:363-424) -------
    seg_stats: list[SegmentStat] = []
    for i, name in enumerate(names):
        wc = sum(1 for k, t, _ in raw_seqs[i] if k == "word" and t and t.strip())
        d_nat = float(nat_len[i]) / rate or 1e-4
        d_syn = (float(raw_len[i]) / rate or 1e-4) if raw_ok[i] else d_nat
        l_syn_seg_val = float(l_raw_seg[i]) if raw_ok[i] else float(l_nat_seg[i])
        rate_ratio = (wc / d_nat) / (wc / d_syn) if wc > 0 and d_syn > 0 else 1.0
        seg_stats.append(
            SegmentStat(
                segment=name,
                p_nat=float(p_seg[i]),
                l_nat=float(l_nat_seg[i]),
                l_syn=l_syn_seg_val,
                d_nat=d_nat,
                d_syn=d_syn,
                wc=wc,
                rate_ratio=rate_ratio,
            )
        )
    baselines = segment_baselines(
        np.array([s.p_nat for s in seg_stats]),
        np.array([s.l_nat for s in seg_stats]),
        np.array([s.rate_ratio for s in seg_stats]),
        settings.baseline_window,
    )

    # --- per-syntagme raw adjustments, vectorised over the flat row axis
    # (Code/audioPipeline.py:437-589) ----------------------------------
    meta = []  # (seg_idx, syn) in dataframe order
    for i, synts in enumerate(synts_per_seg):
        for j, syn in enumerate(synts):
            meta.append((i, j, syn))
    if not meta:
        return MeasureResult(rows=[], seg_stats=seg_stats, baselines=baselines)

    idx_i = np.array([m[0] for m in meta])
    idx_j = np.array([m[1] for m in meta])
    pause_s = np.array([m[2].pause_ms for m in meta], np.float64) / 1000.0
    wc_syn = np.array([m[2].word_count for m in meta], np.float64)
    nat_total = (win_nat[idx_i, idx_j, 1] - win_nat[idx_i, idx_j, 0]) / rate
    nat_total = np.where(nat_total == 0, 1e-4, nat_total)
    empty = raw_slice_empty[idx_i, idx_j]
    raw_present = raw_ok[idx_i]
    eff_win_raw = np.where(empty[:, None], win_raw_dev[idx_i, idx_j], win_raw[idx_i, idx_j])
    syn_total = (eff_win_raw[:, 1] - eff_win_raw[:, 0]) / rate
    # raw file decoded but the window lies past its end: the reference's
    # get_part_duration returns 1e-4 for an empty slice (only get_lufs falls
    # back to the full file, Code/audioPipeline.py:314-323,338-348); the
    # win_nat substitution applies only to missing raw files
    syn_total = np.where(empty & raw_present, 1e-4, syn_total)
    syn_total = np.where(syn_total == 0, 1e-4, syn_total)
    d_nat = np.maximum(nat_total - pause_s, 1e-4)
    d_syn = np.maximum(syn_total - pause_s, 1e-4)

    # These adjustment/smoothing ops are tiny (hundreds of scalars) — on a
    # remote accelerator each would cost a ~30 ms launch, several times the
    # whole host step. Pin them to the local CPU backend; tests (CPU-forced)
    # already validate exactly these numerics.
    from .adjust import smooth_series

    with jax.default_device(_host_cpu_device()):
        p_pct = np.asarray(
            pitch_adjust_pct(
                jnp.asarray(p_syn[idx_i, idx_j], jnp.float32),
                jnp.asarray(baselines["f0"][idx_i], jnp.float32),
                settings.pitch_semitones,
                settings.pitch_lower_clip_factor,
            )
        )
        v_pct = np.asarray(
            volume_adjust_pct(
                jnp.asarray(baselines["loud"][idx_i], jnp.float32),
                jnp.asarray(l_raw_syn[idx_i, idx_j], jnp.float32),
                settings.volume_pct,
            )
        )
        r_pct = np.asarray(
            rate_adjust_pct(
                jnp.asarray(wc_syn, jnp.float32),
                jnp.asarray(d_nat, jnp.float32),
                jnp.asarray(d_syn, jnp.float32),
                settings,
            )
        )

        # --- smoothing across the whole voice (Code/audioPipeline.py:592-602)
        sm_p = np.asarray(
            smooth_series(p_pct, settings.smoothing_alpha, settings.max_jump_percent)
        )
        sm_r = np.asarray(
            smooth_series(r_pct, settings.smoothing_alpha, settings.max_jump_percent)
        )

    rows = [
        MeasureRow(
            segment=names[i],
            syntagme=syn.words,
            pause=int(syn.pause_ms),
            raw_pitch=float(p_pct[k]),
            raw_volume=float(v_pct[k]),
            raw_rate=float(r_pct[k]),
            pitch_smooth=float(sm_p[k]),
            rate_smooth=float(sm_r[k]),
        )
        for k, (i, j, syn) in enumerate(meta)
    ]
    return MeasureResult(rows=rows, seg_stats=seg_stats, baselines=baselines)


def measure_voice(
    seg_files: list[Path],
    textgrid_dir: Path,
    raw_audio_dir: Path,
    settings: ProsodySettings,
    pitch_params: PitchParams | None = None,
    clean_word=None,
    pos_of_factory=None,
) -> MeasureResult:
    """The full measure stage for one voice (Code/audioPipeline.py:261-602
    numerics; SSML emission happens in the pipeline layer)."""
    from ..core.profiling import phase

    pp = pitch_params or PitchParams()
    with phase("measure/prepare"):
        prep = prepare_voice(
            seg_files, textgrid_dir, raw_audio_dir, settings, clean_word, pos_of_factory
        )
    with phase("measure/device"):
        outputs = run_measure_device(prep, pp)
    with phase("measure/postprocess"):
        return postprocess_voice(prep, outputs, settings)


def measure_voices_batched(
    preps: dict[str, PreparedVoice],
    settings: ProsodySettings,
    pitch_params: PitchParams | None = None,
) -> dict[str, MeasureResult]:
    """All voices of a length bucket through ONE device program: segments
    concatenate on the batch axis (padded to the group maxima); baselines
    and smoothing stay voice-local, so results are identical to per-voice
    runs (tested). With several buckets, every bucket's program is
    dispatched asynchronously BEFORE any result is pulled to the host —
    per-group sync reads would serialize device round-trips and leave the
    chip idle between buckets.

    This is the TPU-native replacement for the reference's process pool
    (config.yaml:57-58 — one Whisper model + pipeline per OS process)."""
    pp = pitch_params or PitchParams()
    if not preps:
        return {}
    # The pitch frame grid is a function of the padded T (frames are centred
    # over the padded buffer), so exact per-voice parity requires batching
    # only voices that share the same nat bucket; the LUFS path is
    # padding-invariant, so T2/N pad freely within a group.
    # key by (padded T, sample rate): _dispatch_group applies one rate to the
    # whole group, so voices at different rates must never share a program
    groups: dict[tuple[int, int], dict] = {}
    for name, prep in preps.items():
        groups.setdefault((prep.nat.shape[1], int(prep.rate)), {})[name] = prep

    if len(groups) > 1:
        # several length buckets → ONE fused device program (one launch;
        # launches don't overlap on remote runtimes) packed in-program from
        # per-voice (prefetched) device buffers — no host re-pack/re-upload
        dispatched = _dispatch_groups_fused([list(sub.items()) for sub in groups.values()], pp)
    else:
        dispatched = [_dispatch_group(list(sub.items()), pp) for sub in groups.values()]
    from ..core.profiling import phase

    results: dict[str, MeasureResult] = {}
    for items, lazy in dispatched:
        # same wait/drain split as run_measure_device: the readback is KBs
        # of per-syntagme scalars packed into ONE buffer per launch (each
        # d2h read costs a tunnel roundtrip); the blocking cost is compute
        with phase("measure/device/wait"):
            out = _unpack6(np.asarray(lazy))
        offset = 0
        for name, prep in items:
            S = prep.nat.shape[0]
            Nv = prep.win_nat.shape[1]
            sl = (
                out[0][offset : offset + S, :Nv],  # p_syn
                out[1][offset : offset + S],       # p_seg
                out[2][offset : offset + S, :Nv],  # l_nat_syn
                out[3][offset : offset + S],       # l_nat_seg
                out[4][offset : offset + S, :Nv],  # l_raw_syn
                out[5][offset : offset + S],       # l_raw_seg
            )
            results[name] = postprocess_voice(prep, sl, settings)
            offset += S
    return results


_PACKED_CACHE: dict = {}


def _voice_dev_args(prep: PreparedVoice):
    """One voice's 7 device arrays, reusing prefetched corpus buffers."""
    return _corpus_to_device(
        [prep.nat, prep.nat_len, prep.raw_for_device, prep.raw_len_dev,
         prep.win_nat, prep.win_raw_dev, prep.mask],
        pre=[prep.nat_dev, None, prep.raw_dev, None, None, None, None],
        lens=[prep.nat_len, None, prep.raw_len_dev, None, None, None, None],
    )


def _pack_and_measure(groups, rate, T, T2, N, pp):
    """Traced pack of one bucket group (dtype-promote, pad to the group
    maxima, concat on the batch axis) feeding _measure_device — runs INSIDE
    a jitted program, so per-voice device buffers are consumed with no
    host↔device retransfer."""

    def to_f32(a):
        return pcm.i16_to_f32(a) if a.dtype == jnp.int16 else a

    def pad1(a, n):
        return jnp.pad(a, [(0, 0), (0, n - a.shape[1])] + [(0, 0)] * (a.ndim - 2))

    audio_mixed_nat = len({g[0].dtype for g in groups}) > 1
    audio_mixed_raw = len({g[2].dtype for g in groups}) > 1
    nat = jnp.concatenate([pad1(to_f32(g[0]) if audio_mixed_nat else g[0], T) for g in groups])
    raw = jnp.concatenate([pad1(to_f32(g[2]) if audio_mixed_raw else g[2], T2) for g in groups])
    nat_len = jnp.concatenate([g[1] for g in groups])
    raw_len = jnp.concatenate([g[3] for g in groups])
    win_nat = jnp.concatenate([pad1(g[4], N) for g in groups])
    win_raw = jnp.concatenate([pad1(g[5], N) for g in groups])
    mask = jnp.concatenate([pad1(g[6], N) for g in groups])
    return _measure_device(
        nat, nat_len, raw, raw_len, win_nat, win_raw, mask, rate=rate, T=T, T2=T2, pp=pp
    )


def _dispatch_groups_fused(group_items, pp: PitchParams):
    """ONE device launch for one OR several bucket groups, packing every
    group inside the program from per-voice device arrays. This combines
    measure_buckets_fused's single-launch shape (remote launches cost
    ~30 ms and do not overlap) with the in-program pack's zero-retransfer
    property: prefetched corpus buffers (prefetch_corpus) are consumed
    as-is, where a host-side _group_args pack would re-upload every voice's
    corpus on the measure critical path.

    Returns [(items, lazy _pack6 output [Sg, 3N+3])] matching
    ``group_items``."""
    metas = []
    flat_args = []
    for items in group_items:
        rate = float(items[0][1].rate)
        T = max(p.nat.shape[1] for _, p in items)
        T2 = max(p.raw_for_device.shape[1] for _, p in items)
        N = max(p.win_nat.shape[1] for _, p in items)
        # _corpus_to_device may pad each voice's batch axis to the data-mesh
        # multiple; callers slice results by REAL voice sizes, so the pad
        # rows must be dropped before concatenation
        real_s = tuple(p.nat.shape[0] for _, p in items)
        metas.append((rate, T, T2, N, real_s))
        for _, p in items:
            flat_args.extend(_voice_dev_args(p))
    shapes_key = tuple((tuple(a.shape), str(a.dtype)) for a in flat_args)
    key = (shapes_key, tuple(metas), pp)
    fn = _PACKED_CACHE.get(key)
    if fn is None:
        metas_c = tuple(metas)

        def impl(*flat):
            outs = []
            off = 0
            for rate, T, T2, N, real_s in metas_c:
                groups = [
                    tuple(a[: real_s[i]] for a in flat[off + 7 * i : off + 7 * i + 7])
                    for i in range(len(real_s))
                ]
                off += 7 * len(real_s)
                outs.append(_pack6(_pack_and_measure(groups, rate, T, T2, N, pp)))
            return tuple(outs)

        fn = jax.jit(impl)
        _PACKED_CACHE[key] = fn
    return list(zip(group_items, fn(*flat_args)))


def _dispatch_group_packed(items, pp: PitchParams):
    """Single bucket group through the fused packed dispatch."""
    return _dispatch_groups_fused([items], pp)[0]


def _dispatch_group(items, pp: PitchParams):
    """Launch one bucket group's device program without reading results:
    returns (items, lazy device outputs)."""
    if len(items) == 1:
        prep = items[0][1]
        lazy = _measure_device_packed(
            *_voice_dev_args(prep),
            rate=float(prep.rate), T=int(prep.nat.shape[1]),
            T2=int(prep.raw_for_device.shape[1]), pp=pp,
        )
        return items, lazy
    return _dispatch_group_packed(items, pp)
