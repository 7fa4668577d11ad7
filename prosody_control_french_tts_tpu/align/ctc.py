"""CTC loss and forced alignment on TPU.

The TPU-native replacement for the reference's forced-alignment
subprocesses (MFA/Kaldi, NeMo citrinet, ctc-forced-aligner —
Code/Aligners/Use_MFA.py, NeMo.py, CTCFA.py): given frame log-probabilities
from any acoustic model (the flax encoder in ``models``), Viterbi-align the
blank-interleaved label sequence to frames with a lax.scan over time, all
static shapes, batched with vmap.

Standard CTC topology: states s = blank,l1,blank,l2,…,blank (2L+1);
transitions s→s, s−1→s, and s−2→s when labels differ (no skip over
repeated labels).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30


def _expand_labels(labels: jnp.ndarray, blank: int) -> jnp.ndarray:
    """[L] → [2L+1] blank-interleaved."""
    L = labels.shape[-1]
    ext = jnp.full((2 * L + 1,), blank, labels.dtype)
    return ext.at[1::2].set(labels)


@partial(jax.jit, static_argnames=("blank",))
def ctc_forced_align(
    log_probs: jnp.ndarray, labels: jnp.ndarray, input_len: jnp.ndarray, label_len: jnp.ndarray, blank: int = 0
):
    """Viterbi alignment.

    log_probs: [T, V] frame log-softmax; labels: [L] int; input_len/label_len
    scalars (padding supported). Returns (frame_states [T] int32 — index
    into the expanded sequence; score). frame → label index = state//2 when
    state odd, else blank.
    """
    T, V = log_probs.shape
    L = labels.shape[0]
    S = 2 * L + 1
    ext = _expand_labels(labels, blank)  # [S]
    emit = log_probs[:, ext]  # [T, S]

    s_idx = jnp.arange(S)
    can_skip = (s_idx >= 2) & (s_idx % 2 == 1) & (ext != jnp.roll(ext, 2))
    valid_state = s_idx < (2 * label_len + 1)

    init = jnp.where(s_idx == 0, emit[0, 0], jnp.where(s_idx == 1, emit[0, 1], NEG))
    init = jnp.where(valid_state, init, NEG)

    t_mask = jnp.arange(T - 1) < (input_len - 1)

    def step(alpha, inp):
        e_t, valid_t = inp
        stay = alpha
        from1 = jnp.concatenate([jnp.array([NEG]), alpha[:-1]])
        from2 = jnp.where(can_skip, jnp.concatenate([jnp.array([NEG, NEG]), alpha[:-2]]), NEG)
        stacked = jnp.stack([stay, from1, from2])  # [3, S]
        best = jnp.argmax(stacked, axis=0)
        val = jnp.max(stacked, axis=0) + e_t
        val = jnp.where(valid_state, val, NEG)
        val = jnp.where(valid_t, val, alpha)  # freeze past input_len
        best = jnp.where(valid_t, best, 0)
        return val, best

    final_alpha, back = jax.lax.scan(step, init, (emit[1:], t_mask))
    endA = 2 * label_len  # final blank
    endB = 2 * label_len - 1  # final label
    score_a = final_alpha[endA]
    score_b = final_alpha[jnp.maximum(endB, 0)]
    last_state = jnp.where(score_a >= score_b, endA, jnp.maximum(endB, 0))
    score = jnp.maximum(score_a, score_b)

    # backtrack (freeze beyond input_len)
    def bt(state, inp):
        ptr_row, t_valid = inp
        move = ptr_row[state]
        prev = jnp.where(t_valid, state - move, state)
        return prev, state

    t_valid_rev = (jnp.arange(T - 1) < (input_len - 1))[::-1]
    first_state, states_rev = jax.lax.scan(bt, last_state, (back[::-1], t_valid_rev))
    states = jnp.concatenate([first_state[None], states_rev[::-1]])
    # frames past input_len keep the final state; harmless (masked upstream)
    return states.astype(jnp.int32), score


@partial(jax.jit, static_argnames=("blank",))
def ctc_loss(log_probs, labels, input_len, label_len, blank: int = 0):
    """Sum-product CTC negative log likelihood (same topology, logsumexp
    instead of max) — the training loss for the CTC aligner head."""
    T, V = log_probs.shape
    L = labels.shape[0]
    S = 2 * L + 1
    ext = _expand_labels(labels, blank)
    emit = log_probs[:, ext]
    s_idx = jnp.arange(S)
    can_skip = (s_idx >= 2) & (s_idx % 2 == 1) & (ext != jnp.roll(ext, 2))
    valid_state = s_idx < (2 * label_len + 1)

    init = jnp.where(s_idx == 0, emit[0, 0], jnp.where(s_idx == 1, emit[0, 1], NEG))
    init = jnp.where(valid_state, init, NEG)

    def step(alpha, inp):
        e_t, valid_t = inp
        from1 = jnp.concatenate([jnp.array([NEG]), alpha[:-1]])
        from2 = jnp.where(can_skip, jnp.concatenate([jnp.array([NEG, NEG]), alpha[:-2]]), NEG)
        val = jnp.logaddexp(jnp.logaddexp(alpha, from1), from2) + e_t
        val = jnp.where(valid_state, val, NEG)
        val = jnp.where(valid_t, val, alpha)
        return val, None

    t_mask = jnp.arange(T - 1) < (input_len - 1)
    alpha_last, _ = jax.lax.scan(step, init, (emit[1:], t_mask))
    endA = 2 * label_len
    endB = jnp.maximum(2 * label_len - 1, 0)
    return -jnp.logaddexp(alpha_last[endA], alpha_last[endB])


def states_to_words(
    states: np.ndarray,
    labels: list[int],
    word_spans: list[tuple[int, int]],
    frame_dt: float,
    words: list[str],
):
    """Expanded-state path → word time spans.

    word_spans: label-index [start, end) per word (labels are e.g.
    characters or phonemes). Returns [(t0, t1, word)].
    """
    states = np.asarray(states)
    lab_idx = np.where(states % 2 == 1, states // 2, -1)  # -1 = blank
    out = []
    for (ls, le), w in zip(word_spans, words):
        frames = np.nonzero((lab_idx >= ls) & (lab_idx < le))[0]
        if frames.size == 0:
            continue
        out.append((float(frames[0] * frame_dt), float((frames[-1] + 1) * frame_dt), w))
    return out
