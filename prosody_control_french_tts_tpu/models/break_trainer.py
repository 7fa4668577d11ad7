"""Break-tagger training + bootstrap evaluation (pause_bert.py parity).

The reference trains bert-base-multilingual-uncased for 10 epochs at batch
64 and reports mean±std perplexity/F1 over 10 bootstrap resampling runs
(Code/baseline_models/pause_bert.py:101-115,135-146,212-253). This module
reproduces that harness on the flax tagger with the hermetic WordPiece
tokenizer: every step (fwd+bwd+update) is one jit; evaluation is batched
jit inference — the second north-star benchmark surface (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .bert import BertConfig, BreakTagger, cross_entropy_loss
from .datasets import IGNORE, BreakTagDataset, build_break_dataset
from .tokenizer import WordPieceTokenizer

log = logging.getLogger(__name__)


@dataclass
class BreakMetrics:
    f1: float
    precision: float
    recall: float
    accuracy: float
    perplexity: float


def evaluate_tagger(model, params, ds: BreakTagDataset, batch_size: int = 64) -> BreakMetrics:
    """Masked-token P/R/F1 on the BREAK class + label perplexity
    (pause_bert.py:212-239 reporting)."""

    logits_fn = jax.jit(lambda p, ids, mask: model.apply(p, ids, mask))

    tp = fp = fn = correct = total = 0
    nll_sum = 0.0
    for i in range(0, ds.ids.shape[0], batch_size):
        ids = jnp.asarray(ds.ids[i : i + batch_size])
        mask = jnp.asarray(ds.mask[i : i + batch_size])
        labels = ds.labels[i : i + batch_size]
        logits = np.asarray(logits_fn(params, ids, mask))
        logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        valid = labels != IGNORE
        pred = logits.argmax(-1)
        tp += int(((pred == 1) & (labels == 1) & valid).sum())
        fp += int(((pred == 1) & (labels == 0) & valid).sum())
        fn += int(((pred == 0) & (labels == 1) & valid).sum())
        correct += int(((pred == labels) & valid).sum())
        total += int(valid.sum())
        safe_labels = np.where(valid, labels, 0)
        nll_sum += float(-(np.take_along_axis(logp, safe_labels[..., None], -1)[..., 0] * valid).sum())
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    ppl = float(np.exp(nll_sum / max(total, 1)))
    return BreakMetrics(f1=f1, precision=prec, recall=rec, accuracy=correct / max(total, 1), perplexity=ppl)


def train_tagger(
    ds: BreakTagDataset,
    cfg: BertConfig,
    *,
    epochs: int = 10,  # pause_bert.py:17
    batch_size: int = 64,  # :18
    lr: float = 5e-5,
    seed: int = 0,
):
    model = BreakTagger(cfg)
    rng = jax.random.PRNGKey(seed)
    params = model.init(rng, jnp.asarray(ds.ids[:1]), jnp.asarray(ds.mask[:1]))
    tx = optax.adamw(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, ids, mask, labels, dropout_key):
        def loss_fn(p):
            logits = model.apply(
                p, ids, mask, deterministic=False, rngs={"dropout": dropout_key}
            )
            return cross_entropy_loss(logits, labels, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    n = ds.ids.shape[0]
    nprng = np.random.default_rng(seed)
    key = rng
    loss = jnp.float32(0)
    for _ in range(epochs):
        order = nprng.permutation(n)
        for i in range(0, n, batch_size):
            b = order[i : i + batch_size]
            key, sub = jax.random.split(key)
            params, opt, loss = step(
                params,
                opt,
                jnp.asarray(ds.ids[b]),
                jnp.asarray(ds.mask[b]),
                jnp.asarray(ds.labels[b]),
                sub,
            )
    return model, params, float(loss)


def bootstrap_runs(
    bdd: dict,
    tokenizer: WordPieceTokenizer,
    cfg: BertConfig | None = None,
    runs: int = 10,  # pause_bert.py:101 bootstrap count
    test_frac: float = 0.2,
    epochs: int = 10,
    seed: int = 0,
) -> dict:
    """Bootstrap resampling harness: per run, resample train split with
    replacement, train, evaluate on the held-out split; report mean±std
    (pause_bert.py:101-115,240-253) and keep the best-F1 params."""
    cfg = cfg or BertConfig.tiny(vocab_size=len(tokenizer))
    ds = build_break_dataset(bdd, tokenizer, max_len=cfg.max_len)
    n = ds.ids.shape[0]
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_test = max(1, int(n * test_frac))
    test_idx, train_idx = perm[:n_test], perm[n_test:]
    test = BreakTagDataset(ds.ids[test_idx], ds.mask[test_idx], ds.labels[test_idx])

    results: list[BreakMetrics] = []
    best = (-1.0, None)
    for r in range(runs):
        boot = rng.choice(train_idx, size=len(train_idx), replace=True)
        sub = BreakTagDataset(ds.ids[boot], ds.mask[boot], ds.labels[boot])
        model, params, _ = train_tagger(sub, cfg, epochs=epochs, seed=seed + r)
        m = evaluate_tagger(model, params, test)
        results.append(m)
        if m.f1 > best[0]:
            best = (m.f1, params)
        log.info("bootstrap run %d: F1=%.3f ppl=%.3f", r, m.f1, m.perplexity)

    def agg(attr):
        v = np.array([getattr(m, attr) for m in results])
        return {"mean": float(v.mean()), "std": float(v.std())}

    return {
        "runs": [dataclasses.asdict(m) for m in results],
        "f1": agg("f1"),
        "precision": agg("precision"),
        "recall": agg("recall"),
        "accuracy": agg("accuracy"),
        "perplexity": agg("perplexity"),
        "best_params": best[1],
        "config": cfg,
    }


def sentences_per_second(model, params, ds: BreakTagDataset, batch_size: int = 256, iters: int = 10) -> float:
    """The BASELINE.md second north-star metric: batched jit inference
    throughput of the tagger."""
    import time

    ids = jnp.asarray(np.resize(ds.ids, (batch_size, ds.ids.shape[1])))
    mask = jnp.asarray(np.resize(ds.mask, (batch_size, ds.mask.shape[1])))

    # the whole iteration loop lives on-device (lax.scan, one dispatch, one
    # scalar back): per-iteration host reads — or even per-iteration
    # dispatches — would measure link latency instead of inference
    # throughput (the bench chip sits behind a network tunnel).
    # Elision/DCE guards: each scan step's token ids differ (shift mixes
    # the step index into every row), the accumulator sums the WHOLE
    # output (keeping every batch row live — a single-element read would
    # let XLA slice the batch), and the timed call's `shift` argument
    # differs from the warmup's (identical arg objects can be served from
    # cache on this runtime, see CLAUDE.md).
    V = int(getattr(model.cfg, "vocab_size", 0)) or int(jnp.max(ids)) + 1

    @jax.jit
    def run(p, ids, mask, shift):
        def body(acc, i):
            step_ids = jnp.where(mask, (ids + i + shift) % V, ids)
            out = model.apply(p, step_ids, mask)
            return acc + jnp.sum(out).astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    float(np.asarray(run(params, ids, mask, jnp.int32(0))))  # compile + warm
    t0 = time.perf_counter()
    acc = float(np.asarray(run(params, ids, mask, jnp.int32(1))))
    dt = time.perf_counter() - t0
    assert np.isfinite(acc)
    return batch_size * iters / dt
