"""Pallas TPU kernels for the acoustic hot path.

``extract_frames``: fused frame gather + Hanning windowing for the pitch
kernel's analysis frames. The XLA gather path materialises a [F, W] index
matrix and reads HBM with 4× duplication (hop ≈ W/4); this kernel DMAs
each frame's span HBM→VMEM once, multiplies by the window in VMEM, and
writes the frame block — one pass, no index tensor. Frame starts are
non-uniform (Praat's centred geometry), so they arrive as a scalar-prefetch
operand driving the DMA offsets (pltpu.PrefetchScalarGridSpec).

On CPU (tests/dev) the kernel runs in interpreter mode; numerics match the
gather path exactly (see tests/test_native_and_pallas.py).

Status on real v5e hardware: Mosaic rejects (a) 1-D HBM DMA slices whose
start is unaligned to the 1024-element tiling, (b) DMA slice LENGTHS not
tiling-aligned, and (c) size-1 slices of a tiled dimension; and
``tpu.dynamic_rotate`` lowering is unavailable in this libtpu. The
``extract_frames_aligned`` variant satisfies all three — 1024-aligned
whole-row [·,128] DMAs into a 3-D scratch (leading dim untiled), residual
shifts as bit-decomposed static lane rolls — and is **hardware-validated
bit-exact vs the gather** and 76.7× faster at the production shape
(29.6 ms → 0.386 ms for 4715×880 frames on v5e, vmap-compatible).
``frames_op`` dispatches to it on TPU. The original unaligned-DMA kernel
remains as the simpler interpreter-mode reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAMES_PER_BLOCK = 8


def _frames_kernel(starts_ref, x_hbm, win_ref, out_ref, scratch, sems):
    """One grid step = FRAMES_PER_BLOCK frames.

    starts_ref: [F_padded] SMEM (scalar prefetch); x_hbm: [T] in ANY/HBM;
    win_ref: [1, W] VMEM; out_ref: [FRAMES_PER_BLOCK, W] VMEM block;
    scratch: [FRAMES_PER_BLOCK, W] VMEM; sems: DMA semaphores.
    """
    blk = pl.program_id(0)
    base = blk * FRAMES_PER_BLOCK

    # start all DMAs, then wait — overlapping copies
    for i in range(FRAMES_PER_BLOCK):
        start = starts_ref[base + i]
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, out_ref.shape[1])], scratch.at[i], sems.at[i]
        ).start()
    for i in range(FRAMES_PER_BLOCK):
        start = starts_ref[base + i]
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(start, out_ref.shape[1])], scratch.at[i], sems.at[i]
        ).wait()

    out_ref[:, :] = scratch[:, :] * win_ref[0, :]


@partial(jax.jit, static_argnames=("width", "interpret"))
def extract_frames(
    x: jnp.ndarray, starts: jnp.ndarray, window: jnp.ndarray, width: int, interpret: bool = False
) -> jnp.ndarray:
    """x: [T] f32; starts: [F] int32 (clipped to T-width by caller);
    window: [width] f32 → frames [F, width] = x[start:start+width]·window."""
    F = starts.shape[0]
    Fp = ((F + FRAMES_PER_BLOCK - 1) // FRAMES_PER_BLOCK) * FRAMES_PER_BLOCK
    starts_p = jnp.zeros((Fp,), jnp.int32).at[:F].set(starts.astype(jnp.int32))
    grid = Fp // FRAMES_PER_BLOCK

    out = pl.pallas_call(
        _frames_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
                pl.BlockSpec((1, width), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (FRAMES_PER_BLOCK, width), lambda i, s: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((FRAMES_PER_BLOCK, width), jnp.float32),
                pltpu.SemaphoreType.DMA((FRAMES_PER_BLOCK,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Fp, width), jnp.float32),
        interpret=interpret,
    )(starts_p, x.astype(jnp.float32), window.astype(jnp.float32)[None, :])
    return out[:F]


ALIGN = 1024  # Mosaic's 1-D HBM DMA start-alignment granule on this toolchain


def _frames_kernel_aligned(starts_ref, x_hbm, win_ref, out_ref, scratch, sems):
    """Mosaic-compatible variant: every DMA starts on an ALIGN boundary and
    the residual (dynamic, per-frame) shift happens **in VMEM** as log₂(ALIGN)
    static lane rotates, each applied per-row only where that bit of the
    frame's shift is set. No unaligned DMA, no ``tpu.dynamic_rotate``.

    Layout constraints learned on real v5e Mosaic: DMA slice START and
    LENGTH must both be tiling-aligned, and a size-1 slice of a TILED
    dimension is rejected — so x arrives as [T/128, 128] rows, scratch is
    3-D [FPB, SPAN/128, 128] (the leading dim is untiled and slices
    freely), and the copies move whole 128-lane row blocks.

    starts_ref: [F_padded] SMEM raw frame starts; out_ref: [FPB, padded_width].
    """
    blk = pl.program_id(0)
    base = blk * FRAMES_PER_BLOCK
    span_rows, lanes = scratch.shape[1], scratch.shape[2]
    span = span_rows * lanes

    # aligned enclosing span per frame; start all DMAs, then wait
    for i in range(FRAMES_PER_BLOCK):
        start = starts_ref[base + i]
        row0 = (start // ALIGN) * (ALIGN // lanes)
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(row0, span_rows)], scratch.at[i], sems.at[i]
        ).start()
    for i in range(FRAMES_PER_BLOCK):
        start = starts_ref[base + i]
        row0 = (start // ALIGN) * (ALIGN // lanes)
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(row0, span_rows)], scratch.at[i], sems.at[i]
        ).wait()

    # [FPB, SPAN] int32 map of each row's residual shift (scalar→vector via
    # per-row selects on a row iota — Mosaic-clean, unlike vector-from-scalar
    # stacking)
    row = jax.lax.broadcasted_iota(jnp.int32, (FRAMES_PER_BLOCK, span), 0)
    shift_vec = jnp.zeros((FRAMES_PER_BLOCK, span), jnp.int32)
    for i in range(FRAMES_PER_BLOCK):
        start = starts_ref[base + i]
        s = start - (start // ALIGN) * ALIGN
        shift_vec = jnp.where(row == i, s, shift_vec)

    # dynamic left-shift by s ∈ [0, ALIGN): compose static circular rolls of
    # 1,2,4,…,ALIGN/2 lanes, each taken per-row iff that bit of s is set.
    # Rows only ever read lanes [0, padded_width) afterwards and
    # SPAN ≥ padded_width + ALIGN − 1, so wrapped lanes never surface.
    acc = scratch[...].reshape(FRAMES_PER_BLOCK, span)
    bit = 1
    while bit < ALIGN:
        rolled = pltpu.roll(acc, span - bit, 1)  # left rotate by `bit`
        acc = jnp.where((shift_vec & bit) != 0, rolled, acc)
        bit *= 2
    out_ref[:, :] = acc[:, : out_ref.shape[1]] * win_ref[0, : out_ref.shape[1]]


@partial(jax.jit, static_argnames=("width", "interpret"))
def extract_frames_aligned(
    x: jnp.ndarray, starts: jnp.ndarray, window: jnp.ndarray, width: int, interpret: bool = False
) -> jnp.ndarray:
    """Like :func:`extract_frames` but built from ALIGN-aligned DMAs plus
    in-VMEM bit-decomposed rotates, so it lowers on current Mosaic. Same
    contract: x [T] f32, starts [F] int32 in [0, T-width], window [width]
    → [F, width] = x[start:start+width]·window."""
    F = starts.shape[0]
    Fp = ((F + FRAMES_PER_BLOCK - 1) // FRAMES_PER_BLOCK) * FRAMES_PER_BLOCK
    starts_p = jnp.zeros((Fp,), jnp.int32).at[:F].set(starts.astype(jnp.int32))
    grid = Fp // FRAMES_PER_BLOCK

    wpad = ((width + 127) // 128) * 128
    # Mosaic requires the DMA LENGTH tiling-aligned too (not just the
    # start): "Slice shape along dimension 0 must be aligned to tiling"
    span = ((wpad + ALIGN + ALIGN - 1) // ALIGN) * ALIGN
    win_p = jnp.zeros((1, wpad), jnp.float32).at[0, :width].set(window.astype(jnp.float32))
    # every DMA reads [aligned, aligned+span) with aligned ≤ start ≤ T-width:
    # pad x so the largest read stays in bounds, then present it as 128-lane
    # rows (whole-row DMAs satisfy the tiled-slice rules; see kernel doc)
    LANES = 128
    Tp = ((x.shape[0] + span + LANES - 1) // LANES) * LANES
    x_p = jnp.zeros((Tp,), jnp.float32).at[: x.shape[0]].set(x.astype(jnp.float32))
    x_rows = x_p.reshape(Tp // LANES, LANES)

    out = pl.pallas_call(
        _frames_kernel_aligned,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
                pl.BlockSpec((1, wpad), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (FRAMES_PER_BLOCK, wpad), lambda i, s: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((FRAMES_PER_BLOCK, span // LANES, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((FRAMES_PER_BLOCK,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Fp, wpad), jnp.float32),
        interpret=interpret,
    )(starts_p, x_rows, win_p)
    return out[:F, :width]


def extract_frames_reference(x, starts, window, width):
    """The XLA gather path (what ops.pitch uses by default) — the oracle
    for the kernel and the fallback off-TPU."""
    idx = starts[:, None] + jnp.arange(width)[None, :]
    idx = jnp.clip(idx, 0, x.shape[-1] - 1)
    return jnp.take(x, idx, axis=-1) * window[None, :]


def frames_op(x, starts, window, width: int):
    """Dispatch: the aligned-DMA Pallas kernel on TPU (hardware-validated
    bit-exact vs the gather, 76.7× faster at the production shape
    [4715 frames × 880 samples]: 29.6 ms → 0.39 ms on v5e; works under
    vmap), XLA gather elsewhere. Contract: starts ∈ [0, T − width]."""
    if jax.devices()[0].platform == "tpu":
        return extract_frames_aligned(x, starts, window, width)
    return extract_frames_reference(x, starts, window, width)


# ---------------------------------------------------------------------------
# pitch-candidate kernel: local maxima → top-k → parabolic, one HBM pass
# ---------------------------------------------------------------------------

CAND_ROWS = 256  # frames per block


def _candidates_kernel(r_ref, lagf_ref, str_ref, valid_ref, *, k, min_lag, max_lag, vth):
    """One block = CAND_ROWS frames × Lp lags, all VMEM-resident.

    Replicates ops.pitch's candidate stage exactly: local maxima of r
    (strictly above left neighbour, ≥ right neighbour, > vth/2, interior
    lags only), the k strongest in descending order with first-index ties
    (the masked-argmax contract), and parabolic interpolation — but in ONE
    pass over r. The XLA formulation re-reads the [F, L] tensor from HBM
    ~4× per top-k round (14 rounds ≈ 6 GB of traffic at the corpus shape,
    measured 104 ms of the 240 ms measure program); here every round is a
    VPU reduction over registers.

    Neighbour access uses circular lane rolls: the wrapped lanes are always
    outside [min_lag, max_lag) so the interior mask kills them, matching
    the XLA path's edge-clamped shifts.
    """
    r = r_ref[...]
    R, Lp = r.shape
    lag = jax.lax.broadcasted_iota(jnp.int32, (R, Lp), 1)
    r_m1 = pltpu.roll(r, 1, 1)  # lane i reads r[i-1]
    r_p1 = pltpu.roll(r, Lp - 1, 1)  # lane i reads r[i+1]
    interior = (lag >= min_lag) & (lag < max_lag)
    is_max = (r > r_m1) & (r >= r_p1) & (r > 0.5 * vth) & interior
    NEG = jnp.float32(-1e30)
    score = jnp.where(is_max, r, NEG)
    BIG = jnp.int32(1 << 30)

    kp = lagf_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (R, kp), 1)
    lagf_acc = jnp.zeros((R, kp), jnp.float32)
    str_acc = jnp.zeros((R, kp), jnp.float32)
    valid_acc = jnp.zeros((R, kp), jnp.float32)

    for s in range(k):
        v = jnp.max(score, axis=1)  # [R]
        found = v > NEG * 0.5
        # first index attaining the max (lax.top_k / argmax tie rule)
        i = jnp.min(jnp.where(score == v[:, None], lag, BIG), axis=1)
        sel = lag == i[:, None]
        # r at i−1, i, i+1 as masked sums (exactly one lane selected)
        rv = jnp.sum(jnp.where(sel, r, 0.0), axis=1)
        rl = jnp.sum(jnp.where(lag == i[:, None] - 1, r, 0.0), axis=1)
        rr_ = jnp.sum(jnp.where(lag == i[:, None] + 1, r, 0.0), axis=1)
        dr = 0.5 * (rr_ - rl)
        d2r = 2.0 * rv - rl - rr_
        offset = jnp.where(jnp.abs(d2r) > 1e-12, dr / d2r, 0.0)
        lag_f = i.astype(jnp.float32) + jnp.clip(offset, -1.0, 1.0)
        # parabolic peak value uses the UNCLIPPED offset (ops.pitch parity)
        strength = rv + 0.5 * dr * offset
        this = col == s
        lagf_acc = jnp.where(this, jnp.where(found, lag_f, 0.0)[:, None], lagf_acc)
        str_acc = jnp.where(this, jnp.where(found, strength, 0.0)[:, None], str_acc)
        valid_acc = jnp.where(this & found[:, None], 1.0, valid_acc)
        score = jnp.where(sel, NEG, score)

    lagf_ref[...] = lagf_acc
    str_ref[...] = str_acc
    valid_ref[...] = valid_acc


@partial(jax.jit, static_argnames=("k", "min_lag", "max_lag", "vth", "interpret"))
def topk_parabolic(
    r: jnp.ndarray, k: int, min_lag: int, max_lag: int, vth: float, interpret: bool = False
):
    """r: [F, L] normalised autocorrelation → (lag_f [F, k], strength [F, k],
    valid [F, k] bool): the k strongest parabolic-interpolated local maxima
    per frame, descending, zeros past the row's real maxima. Matches the
    XLA candidate stage of ops.pitch._pitch_frames element-for-element."""
    F, L = r.shape
    LANES = 128
    Lp = ((L + LANES - 1) // LANES) * LANES
    Fp = ((F + CAND_ROWS - 1) // CAND_ROWS) * CAND_ROWS
    kp = ((k + LANES - 1) // LANES) * LANES
    r_p = jnp.zeros((Fp, Lp), jnp.float32).at[:F, :L].set(r.astype(jnp.float32))

    kern = partial(_candidates_kernel, k=k, min_lag=min_lag, max_lag=max_lag, vth=float(vth))
    lagf, strength, valid = pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(Fp // CAND_ROWS,),
            in_specs=[pl.BlockSpec((CAND_ROWS, Lp), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=[
                pl.BlockSpec((CAND_ROWS, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((CAND_ROWS, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((CAND_ROWS, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Fp, kp), jnp.float32),
            jax.ShapeDtypeStruct((Fp, kp), jnp.float32),
            jax.ShapeDtypeStruct((Fp, kp), jnp.float32),
        ],
        interpret=interpret,
    )(r_p)
    return lagf[:F, :k], strength[:F, :k], valid[:F, :k] > 0.5


# ---------------------------------------------------------------------------
# chunked cumsum kernel — compiles and runs on real v5e hardware
# ---------------------------------------------------------------------------

CUMSUM_CHUNK = 1024
_CUMSUM_ROWS = 8


def _chunk_cumsum_kernel(x_ref, out_ref):
    """Exclusive within-chunk prefix sums of an [8, 1024] tile via log₂
    shift-adds (pltpu.roll with static shifts — Mosaic-clean, unlike the
    dynamic rotates the frame kernel needs)."""
    x = x_ref[...]
    acc = x
    shift = 1
    while shift < CUMSUM_CHUNK:
        rolled = pltpu.roll(acc, shift, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (_CUMSUM_ROWS, CUMSUM_CHUNK), 1)
        acc = acc + jnp.where(col >= shift, rolled, 0.0)
        shift *= 2
    out_ref[...] = acc - x


@partial(jax.jit, static_argnames=("interpret",))
def chunk_cumsum(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Exclusive per-1024-chunk prefix sums of x [R, C] (R % 8 == 0,
    C % 1024 == 0) — the inner stage of ops.cumsum.ChunkedCumsum as a
    Pallas kernel. Hardware-validated on v5e; XLA's own cumsum currently
    beats the shift-add formulation (its scan lowering makes one pass
    where this makes log₂(1024) = 10), so the jnp path stays the default —
    this kernel documents the working aligned-tile pattern for Pallas on
    this toolchain and serves as the scaffold for a fused
    square+cumsum+gate loudness kernel."""
    R, C = x.shape
    return pl.pallas_call(
        _chunk_cumsum_kernel,
        grid_spec=pl.GridSpec(
            grid=(R // _CUMSUM_ROWS, C // CUMSUM_CHUNK),
            in_specs=[
                pl.BlockSpec((_CUMSUM_ROWS, CUMSUM_CHUNK), lambda i, j: (i, j), memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(
                (_CUMSUM_ROWS, CUMSUM_CHUNK), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32))
