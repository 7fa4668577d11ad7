"""BiLSTM prosody regressor (flax) — parity with
Code/baseline_models/bilstm.py:116-135:

    LayerNorm → BiLSTM(40) → tanh Dense(20) → Dense(3)   [pitch, volume, rate]

Inputs are sliding windows of SEQ_LEN ∈ {1..4} sentence embeddings
(bilstm.py:62-95); targets are z-scored percentages (load_and_calibrate,
:28-60). The LSTM is an ``nn.scan``-unrolled cell, bidirectional by
running the reversed sequence through a second cell.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BiLSTMConfig:
    embed_dim: int = 768  # all-mpnet-base-v2 dimension (bilstm.py:12)
    hidden: int = 40  # bilstm.py:121
    dense: int = 20  # bilstm.py:128
    outputs: int = 3  # pitch, volume, rate


class _LSTM(nn.Module):
    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x):  # x: [B, T, D]
        if self.reverse:
            x = jnp.flip(x, axis=1)
        cell = nn.OptimizedLSTMCell(self.hidden)
        scan = nn.scan(
            type(cell),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        B = x.shape[0]
        carry = cell.initialize_carry(jax.random.PRNGKey(0), (B, x.shape[-1]))
        _, ys = scan(self.hidden, name="cell")(carry, x)
        if self.reverse:
            ys = jnp.flip(ys, axis=1)
        return ys


class BiLSTMProsody(nn.Module):
    cfg: BiLSTMConfig = BiLSTMConfig()

    @nn.compact
    def __call__(self, x):  # x: [B, T, D] windows of sentence embeddings
        c = self.cfg
        x = nn.LayerNorm()(x)
        fwd = _LSTM(c.hidden, name="fwd")(x)
        bwd = _LSTM(c.hidden, reverse=True, name="bwd")(x)
        h = jnp.concatenate([fwd[:, -1, :], bwd[:, -1, :]], axis=-1)  # last step
        h = jnp.tanh(nn.Dense(c.dense)(h))
        return nn.Dense(c.outputs)(h)


def sliding_windows(embeddings: np.ndarray, targets: np.ndarray, seq_len: int):
    """[N, D], [N, 3] → ([N-L+1, L, D], [N-L+1, 3]) — window predicts the
    last element's targets (bilstm.py:62-95)."""
    n = embeddings.shape[0]
    if n < seq_len:
        return np.zeros((0, seq_len, embeddings.shape[1])), np.zeros((0, targets.shape[1]))
    xs = np.stack([embeddings[i : i + seq_len] for i in range(n - seq_len + 1)])
    ys = targets[seq_len - 1 :]
    return xs, ys


def zscore_calibrate(values: np.ndarray):
    """(values−μ)/σ plus the inverse transform — the raw-%↔z-score
    calibration the reference reports both ways (bilstm.py:28-60,247-271)."""
    mu = values.mean(axis=0)
    sd = values.std(axis=0)
    sd = np.where(sd < 1e-8, 1.0, sd)
    return (values - mu) / sd, (mu, sd)


def train_bilstm(
    xs: np.ndarray,
    ys: np.ndarray,
    *,
    seed: int = 0,
    epochs: int = 60,
    batch_size: int = 32,
    lr: float = 1e-3,
    val_frac: float = 0.15,
):
    """MSE/Adam training with best-validation checkpoint kept in memory
    (bilstm.py:184-232). Returns (params, history)."""
    import optax

    model = BiLSTMProsody(BiLSTMConfig(embed_dim=xs.shape[-1]))
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.asarray(xs[:1]))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    n = xs.shape[0]
    n_val = max(1, int(n * val_frac))
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    val_idx, tr_idx = perm[:n_val], perm[n_val:]
    xv, yv = jnp.asarray(xs[val_idx]), jnp.asarray(ys[val_idx])

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            pred = model.apply(p, xb)
            return jnp.mean((pred - yb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def val_loss(params):
        return jnp.mean((model.apply(params, xv) - yv) ** 2)

    best = (np.inf, params)
    history = []
    for _ in range(epochs):
        rng.shuffle(tr_idx)
        for i in range(0, len(tr_idx), batch_size):
            b = tr_idx[i : i + batch_size]
            params, opt_state, _ = step(params, opt_state, jnp.asarray(xs[b]), jnp.asarray(ys[b]))
        vl = float(val_loss(params))
        history.append(vl)
        if vl < best[0]:
            best = (vl, jax.tree.map(lambda a: a.copy(), params))
    return best[1], history
