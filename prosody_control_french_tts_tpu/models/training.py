"""Training loops: LoRA fine-tuning of the decoder LM under pjit.

Mirrors the reference's HF-Trainer setups (QwenA.py:502-556: bf16,
grad-accumulation 16, lr 3e-4, adamw, LoRA-only updates; QwenB.py:210-235)
as explicit jitted steps: the full step (fwd+bwd+update) is one compiled
program over the ("data","model") mesh; only adapter parameters carry
optimizer state (optax.masked).
"""

from __future__ import annotations

from dataclasses import dataclass


import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .llm import DecoderLM, LLMConfig, causal_lm_loss
from .lora import lora_param_mask
from ..parallel.sharding import llm_param_spec


@dataclass
class TrainState:
    params: dict
    opt_state: object
    step: int = 0
    # bool pytree marking the trainable leaves the optimizer state covers;
    # pass it as make_train_step(trainable=state.mask)
    mask: dict | None = None


def make_optimizer(lr: float = 3e-4, weight_decay: float = 0.0, accum: int = 1):
    """adamw over LoRA params only, with gradient accumulation
    (batch 1 × accum 16/32 in the reference)."""
    tx = optax.adamw(lr, weight_decay=weight_decay)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def _trainable_indices(flat, trainable_flat):
    """Indices of leaves that are float AND marked trainable (None → all
    float leaves). Integer leaves (quantized base kernels, models.quant)
    always ride along as constants."""
    return [
        i
        for i, x in enumerate(flat)
        if jnp.issubdtype(x.dtype, jnp.floating)
        and (trainable_flat is None or trainable_flat[i])
    ]


def init_train(
    cfg: LLMConfig,
    rng=None,
    lr: float = 3e-4,
    accum: int = 1,
    lora_only: bool = True,
    frozen_dtype=None,
):
    """Build (model, tx, TrainState). The optimizer state covers ONLY the
    trainable float leaves (the LoRA adapters when ``lora_only``): adamw
    moments for 130M frozen base params would be pure HBM dead weight.
    ``frozen_dtype`` (e.g. jnp.bfloat16) downcasts the frozen float base —
    the reference loads its base in bf16 too (QwenA.py:507
    torch_dtype=bfloat16) — halving the per-step weight-stream bytes.
    The trainable mask ships in ``state.mask``; hand it to
    make_train_step(trainable=state.mask)."""
    model = DecoderLM(cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 8), jnp.int32))
    mask = (
        lora_param_mask(params)
        if (lora_only and cfg.lora_rank > 0)
        else jax.tree.map(lambda x: jnp.issubdtype(x.dtype, jnp.floating), params)
    )
    if frozen_dtype is not None:
        params = jax.tree.map(
            lambda x, m: x
            if (m or not jnp.issubdtype(x.dtype, jnp.floating))
            else x.astype(frozen_dtype),
            params,
            mask,
        )
    tx = make_optimizer(lr, accum=accum)
    flat, _ = jax.tree_util.tree_flatten(params)
    mask_flat = jax.tree_util.tree_flatten(mask)[0]
    fidx = _trainable_indices(flat, mask_flat)
    opt_state = tx.init(tuple(flat[i] for i in fidx))
    return model, tx, TrainState(params=params, opt_state=opt_state, mask=mask)


def make_train_step(
    model: DecoderLM,
    tx,
    donate: bool = True,
    trainable: dict | None = None,
    loss_impl: str = "auto",
    scan_steps: int | None = None,
):
    """One fused fwd+bwd+update program.

    ``scan_steps=N`` returns instead a MULTI-step program
    ``fn(params, opt_state, ids [N, B, L], loss_mask) → (params, opt_state,
    losses [N])`` — the same step body rolled through ``lax.scan``, so N
    optimizer steps run as ONE executable launch. Per-step Python dispatch
    is pure overhead on any host (and ~3 ms/step of serialized launch cost
    over this repo's TPU tunnel — measured r5: 31.8 → 28.6 ms/step at the
    bench geometry); training loops that pre-stage batches should prefer
    the scanned form.

    ``trainable`` (a bool pytree like ``lora_param_mask(params)``, i.e.
    ``state.mask`` from init_train) restricts differentiation AND the
    optimizer to those leaves. This is not just bookkeeping: without it
    the VJP emits a weight-gradient matmul for EVERY frozen base kernel
    (embedding, lm-head, all attention/ffn projections) — ~2P of the 6P
    fwd+bwd FLOPs wasted in the LoRA/QLoRA shape (the reference freezes
    the base the same way, QwenA.py:502-537). Frozen leaves never see a
    zeros-like gradient or an add-zero update either: they pass through
    the step as the SAME buffers, so with donation XLA aliases them
    in-place — zero HBM traffic for ~99.9 % of the parameter bytes.

    The optimizer state must have been init'ed over the same leaf subset
    (init_train does this; its tx is a plain adamw over the tuple of
    trainable leaves).

    Multi-chip usage is computation-follows-data: shard ``params`` with
    ``shard_train_inputs`` (TP policy + batch over "data") before calling;
    jit propagates the shardings and XLA inserts the collectives.
    """
    trainable_flat = (
        jax.tree_util.tree_flatten(trainable)[0] if trainable is not None else None
    )
    # "fused" routes the LM head through the Pallas linear-CE
    # (ops/fused_ce) — no [B,L,V] logits in HBM. "auto" picks it whenever
    # the geometry tiles (dim %128, vocab %512); tiny test configs fall
    # back to the dense loss. The fused kernel computes NO dW for the
    # head (its backward returns zeros for W), so it is only legal when
    # the lm_head kernel is frozen — true for every LoRA mask; a
    # full-fine-tune step (trainable=None or head marked True) must take
    # the dense path.
    from ..ops.fused_ce import linear_ce_supported
    from .llm import causal_lm_loss_fused

    def _head_frozen():
        if trainable is None:
            return False
        try:
            return not bool(trainable["params"]["lm_head"]["kernel"])
        except (KeyError, TypeError):
            return False

    use_fused = loss_impl == "fused" or (
        loss_impl == "auto"
        and linear_ce_supported(model.cfg.dim, model.cfg.vocab_size)
        and _head_frozen()
    )
    if loss_impl == "fused" and not _head_frozen():
        raise ValueError(
            "loss_impl='fused' requires a frozen lm_head (the fused CE "
            "computes no dW); pass the LoRA trainable mask or use 'dense'"
        )

    def step_fn(params, opt_state, ids, loss_mask):
        flat, treedef = jax.tree_util.tree_flatten(params)
        fidx = _trainable_indices(flat, trainable_flat)

        def loss_fn(fvals):
            merged = list(flat)
            for i, v in zip(fidx, fvals):
                merged[i] = v
            tree = jax.tree_util.tree_unflatten(treedef, merged)
            if use_fused:
                hidden = model.apply(tree, ids, return_hidden=True)
                head_w = tree["params"]["lm_head"]["kernel"]
                return causal_lm_loss_fused(
                    hidden, head_w, ids, loss_mask,
                    interpret=jax.default_backend() != "tpu",
                )
            logits = model.apply(tree, ids)
            return causal_lm_loss(logits, ids, loss_mask)

        fvals = tuple(flat[i] for i in fidx)
        loss, fgrads = jax.value_and_grad(loss_fn)(fvals)
        updates, opt_state = tx.update(fgrads, opt_state, fvals)
        new_fvals = optax.apply_updates(fvals, updates)
        merged = list(flat)
        for i, v in zip(fidx, new_fvals):
            merged[i] = v
        params = jax.tree_util.tree_unflatten(treedef, merged)
        return params, opt_state, loss

    if scan_steps is None:
        return jax.jit(step_fn, donate_argnums=(0, 1) if donate else ())

    def multi_fn(params, opt_state, ids_stacked, loss_mask):
        def body(carry, ids):
            p, o = carry
            p, o, loss = step_fn(p, o, ids, loss_mask)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), ids_stacked
        )
        return params, opt_state, losses

    return jax.jit(multi_fn, donate_argnums=(0, 1) if donate else ())


def shard_train_inputs(mesh, params, opt_state, ids, loss_mask):
    """Place the training state on the mesh: params per the TP policy,
    optimizer state replicated (LoRA adapters are tiny), batch over
    "data"."""
    pspec = llm_param_spec(params)
    params = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, pspec
    )
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())) if hasattr(x, "shape") else x,
        opt_state,
    )
    data_s = NamedSharding(mesh, P("data"))
    return params, opt_state, jax.device_put(ids, data_s), jax.device_put(loss_mask, data_s)
