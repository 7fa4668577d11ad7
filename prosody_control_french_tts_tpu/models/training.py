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


def make_optimizer(lr: float = 3e-4, weight_decay: float = 0.0, accum: int = 1):
    """adamw over LoRA params only, with gradient accumulation
    (batch 1 × accum 16/32 in the reference)."""
    tx = optax.adamw(lr, weight_decay=weight_decay)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def init_train(
    cfg: LLMConfig, rng=None, lr: float = 3e-4, accum: int = 1, lora_only: bool = True
):
    model = DecoderLM(cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 8), jnp.int32))
    base_tx = make_optimizer(lr, accum=accum)
    if lora_only and cfg.lora_rank > 0:
        # freeze base weights: adapters get adamw, everything else zero
        # updates (optax.masked would pass raw grads through for the
        # unmasked leaves)
        mask = lora_param_mask(params)
        labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
        tx = optax.multi_transform(
            {"train": base_tx, "freeze": optax.set_to_zero()}, labels
        )
    else:
        tx = base_tx
    opt_state = tx.init(params)
    return model, tx, TrainState(params=params, opt_state=opt_state)


def make_train_step(model: DecoderLM, tx, donate: bool = True, trainable: dict | None = None):
    """One fused fwd+bwd+update program.

    ``trainable`` (a bool pytree like ``lora_param_mask(params)``) restricts
    differentiation to those leaves. This is not just bookkeeping: without
    it the VJP emits a weight-gradient matmul for EVERY frozen base kernel
    (embedding, lm-head, all attention/ffn projections) whose result the
    optimizer then multiplies by zero — ~2P of the 6P fwd+bwd FLOPs and the
    matching HBM write traffic, entirely wasted in the LoRA/QLoRA shape
    (the reference freezes the base the same way, QwenA.py:502-537).

    Multi-chip usage is computation-follows-data: shard ``params`` with
    ``shard_train_inputs`` (TP policy + batch over "data") before calling;
    jit propagates the shardings and XLA inserts the collectives.
    """
    trainable_flat = (
        jax.tree_util.tree_flatten(trainable)[0] if trainable is not None else None
    )

    def step_fn(params, opt_state, ids, loss_mask):
        # Differentiate only float leaves: a quantized base (models.quant)
        # stores int8/uint8 kernels in the tree, and jax.grad rejects
        # integer inputs — the QLoRA shape is "quantized base frozen,
        # float adapters trained", so integer leaves ride along as
        # constants with zero updates.
        flat, treedef = jax.tree_util.tree_flatten(params)
        fidx = [
            i
            for i, x in enumerate(flat)
            if jnp.issubdtype(x.dtype, jnp.floating)
            and (trainable_flat is None or trainable_flat[i])
        ]

        def loss_fn(fvals):
            merged = list(flat)
            for i, v in zip(fidx, fvals):
                merged[i] = v
            logits = model.apply(jax.tree_util.tree_unflatten(treedef, merged), ids)
            return causal_lm_loss(logits, ids, loss_mask)

        loss, fgrads = jax.value_and_grad(loss_fn)(tuple(flat[i] for i in fidx))
        gflat = [jnp.zeros_like(x) for x in flat]
        for i, g in zip(fidx, fgrads):
            gflat[i] = g
        grads = jax.tree_util.tree_unflatten(treedef, gflat)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step_fn, donate_argnums=(0, 1) if donate else ())


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
