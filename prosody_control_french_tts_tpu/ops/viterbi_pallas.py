"""Pallas TPU kernel for the Praat pitch path finder (batched Viterbi).

The path finder is a sequential DP over ~10⁴ frames with a tiny (K=15)
state — the one stage of the measure program XLA cannot schedule well:

- ``lax.scan`` pays per-step dispatch overhead ×F (measured 43.9 ms at the
  corpus bucket shape [5, 4715, 15] on v5e, floor-free);
- ``lax.associative_scan`` (the max-plus formulation) is parallel but
  moves [F, K, K] transition matrices through HBM log₂F times
  (measured 13.9 ms).

This kernel keeps the whole DP state in VMEM: segments ride the sublane
axis, candidates the lane axis, and one fori_loop step costs a handful of
[16, 128] VPU ops. Two passes (forward α, backward β with fused per-frame
argmax) read each input row exactly once from HBM via the grid pipeline.

Algorithm = exactly ``ops.pitch._viterbi_parallel``'s α/β decomposition:
    α[t][k] = max_j(α[t−1][j] − cost(j→k)) + δ[t][k]
    β[t][j] = max_k(−cost(j→k) + δ[t+1][k] + β[t+1][k])
    path[t] = argmax_k(α[t][k] + β[t][k])     (first-max tie-breaking)
with per-step renormalisation (a uniform shift per frame — argmax-
invariant) so scores stay in float32 range over arbitrarily long tracks.

Numerical parity: tests assert the full track equals the sequential scan
on CPU (interpret mode) and the corpus golden sweep is unchanged.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
SUB = 16  # sublane tile (segments per kernel instance)
LANE = 128  # lane tile (candidate axis, K ≤ LANE)
CHUNK = 64  # frames per grid step


def _cost_row(lf_j, v_j, lf_cur, v_cur, vuv_cost, jump_cost):
    """Transition cost from candidate j (scalars broadcast [SUB, LANE])
    to every current candidate ([SUB, LANE]) — ops.pitch trans_cost."""
    jump = jump_cost * jnp.abs(lf_j - lf_cur)
    both = v_j * v_cur
    neither = (1.0 - v_j) * (1.0 - v_cur)
    return jnp.where(neither > 0.5, 0.0, jnp.where(both > 0.5, jump, vuv_cost))


def _fwd_kernel(delta_ref, lf_ref, v_ref, alpha_ref, psi, lf_prev, v_prev, *, K, F, vuv, jump):
    i = pl.program_id(0)

    def step(tt, _):
        t = i * CHUNK + tt
        d = delta_ref[tt]
        lf = lf_ref[tt]
        v = v_ref[tt]

        def init():
            return d

        def advance():
            run = jnp.full((SUB, LANE), NEG, jnp.float32)
            for j in range(K):
                pj = jnp.broadcast_to(psi[:, j : j + 1], (SUB, LANE))
                lfj = jnp.broadcast_to(lf_prev[:, j : j + 1], (SUB, LANE))
                vj = jnp.broadcast_to(v_prev[:, j : j + 1], (SUB, LANE))
                run = jnp.maximum(run, pj - _cost_row(lfj, vj, lf, v, vuv, jump))
            return run + d

        new_psi = jax.lax.cond(t == 0, init, advance)
        # renormalise (uniform per-frame shift; argmax-invariant) so scores
        # stay bounded over arbitrarily long tracks
        new_psi = new_psi - jnp.max(new_psi, axis=1, keepdims=True)
        new_psi = jnp.maximum(new_psi, NEG)  # keep padding lanes pinned

        @pl.when(t < F)
        def _():
            alpha_ref[tt] = new_psi
            psi[...] = new_psi
            lf_prev[...] = lf
            v_prev[...] = v

        return 0

    jax.lax.fori_loop(0, CHUNK, step, 0)


def _bwd_kernel(delta_ref, lf_ref, v_ref, alpha_ref, best_ref, beta, lf_next, v_next, d_next, *, K, F, vuv, jump):
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)

    def step(q, _):
        tt = CHUNK - 1 - q
        t = (nblk - 1 - i) * CHUNK + tt
        d = delta_ref[tt]
        lf = lf_ref[tt]
        v = v_ref[tt]

        def init():
            return jnp.where(lane < K, 0.0, NEG)

        def advance():
            # β[t][j] = max_k(−cost(j→k) + δ[t+1][k] + β[t+1][k])
            m = d_next[...] + beta[...]
            out = jnp.full((SUB, LANE), NEG, jnp.float32)
            for j in range(K):
                lfj = jnp.broadcast_to(lf[:, j : j + 1], (SUB, LANE))
                vj = jnp.broadcast_to(v[:, j : j + 1], (SUB, LANE))
                bj = jnp.max(m - _cost_row(lfj, vj, lf_next[...], v_next[...], vuv, jump), axis=1)
                out = jnp.where(lane == j, bj[:, None], out)
            return out

        new_beta = jax.lax.cond(t == F - 1, init, advance)
        new_beta = new_beta - jnp.max(new_beta, axis=1, keepdims=True)
        new_beta = jnp.maximum(new_beta, NEG)

        @pl.when(t < F)
        def _():
            score = alpha_ref[tt] + new_beta
            best_ref[tt] = jnp.argmax(score, axis=1).astype(jnp.int32)
            beta[...] = new_beta
            lf_next[...] = lf
            v_next[...] = v
            d_next[...] = d

        return 0

    jax.lax.fori_loop(0, CHUNK, step, 0)


def _pack(x, Fp, fill):
    """[S, F, K] → [Fp, SUB, LANE] float32 (time-major, segments on
    sublanes, candidates on lanes)."""
    S, F, K = x.shape
    out = jnp.full((Fp, SUB, LANE), fill, jnp.float32)
    return out.at[:F, :S, :K].set(jnp.swapaxes(x.astype(jnp.float32), 0, 1))


@partial(jax.jit, static_argnames=("p", "dt", "interpret"))
def viterbi_pallas_batched(freq, strength, intensity, p, dt: float, interpret: bool = False):
    """Batched Praat path finder. freq/strength: [S, F, K], intensity
    [S, F] → f0 [S, F] (0 = unvoiced). S ≤ 16, K ≤ 128."""
    S, F, K = freq.shape
    assert S <= SUB and K <= LANE
    # _viterbi_inputs math inlined (it broadcasts over the leading segment
    # axis; the costs are static Python floats)
    tsc = dt / 0.01
    vuv_cost = p.voiced_unvoiced_cost * tsc
    jump_cost = p.octave_jump_cost * tsc
    voiced = (freq > 0.0) & (freq <= p.ceiling)
    unvoiced_strength = p.voicing_threshold + jnp.maximum(
        0.0, 2.0 - intensity * (1.0 + p.voicing_threshold) / p.silence_threshold
    )
    delta = jnp.where(
        voiced,
        strength - p.octave_cost * jnp.log2(p.ceiling / jnp.maximum(freq, 1e-6)),
        unvoiced_strength[..., None],
    )
    lf = jnp.log2(jnp.maximum(freq, 1e-6))

    Fp = ((F + CHUNK - 1) // CHUNK) * CHUNK
    # padding: lanes ≥ K get δ = −1e30 (never chosen); frames ≥ F are
    # skipped inside the kernels (@pl.when(t < F)), so their content is
    # irrelevant — β starts exactly at the true last frame.
    d_p = _pack(delta, Fp, NEG)
    lf_p = _pack(lf, Fp, 0.0)
    v_p = _pack(voiced.astype(jnp.float32), Fp, 0.0)

    nblk = Fp // CHUNK
    blk = lambda i: (i, 0, 0)
    spec = pl.BlockSpec((CHUNK, SUB, LANE), blk, memory_space=pltpu.VMEM)
    kw = dict(K=K, F=F, vuv=float(vuv_cost), jump=float(jump_cost))

    alpha = pl.pallas_call(
        partial(_fwd_kernel, **kw),
        grid=(nblk,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Fp, SUB, LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((SUB, LANE), jnp.float32),
            pltpu.VMEM((SUB, LANE), jnp.float32),
            pltpu.VMEM((SUB, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(d_p, lf_p, v_p)

    rblk = lambda i: (nblk - 1 - i, 0, 0)
    rspec = pl.BlockSpec((CHUNK, SUB, LANE), rblk, memory_space=pltpu.VMEM)
    best = pl.pallas_call(
        partial(_bwd_kernel, **kw),
        grid=(nblk,),
        in_specs=[rspec, rspec, rspec, rspec],
        out_specs=pl.BlockSpec((CHUNK, SUB), lambda i: (nblk - 1 - i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Fp, SUB), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((SUB, LANE), jnp.float32),
            pltpu.VMEM((SUB, LANE), jnp.float32),
            pltpu.VMEM((SUB, LANE), jnp.float32),
            pltpu.VMEM((SUB, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(d_p, lf_p, v_p, alpha)

    path = jnp.swapaxes(best[:F, :S], 0, 1)  # [S, F]
    f0 = jnp.take_along_axis(freq, path[..., None], axis=-1)[..., 0]
    vsel = jnp.take_along_axis(voiced, path[..., None], axis=-1)[..., 0]
    return jnp.where(vsel, f0, 0.0)
