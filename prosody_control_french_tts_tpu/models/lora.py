"""LoRA (low-rank adaptation) for flax Dense kernels.

The reference trains Qwen2.5-7B with PEFT LoRA r=8 α=16 on
q/k/v/o/gate/up/down projections (Code/ssml_models/cascading_model/
QwenA.py:181-197, QwenB.py:114-136). Here LoRA is a first-class module:
``LoRADense`` computes ``x·W + (α/r)·(x·A)·B`` with A ~ N(0, 1/r), B = 0,
and the parameter tree keeps base and adapter weights in separate
collections so the optimizer masks base weights out natively.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LoRADense(nn.Module):
    """``quant`` selects weight-only storage for the BASE kernel
    ("int8" per-channel / "nf4" blockwise-packed — models.quant): the
    parameter tree then carries ("kernel_q", "kernel_scale") instead of
    "kernel", dequantized to ``dtype`` in-program so XLA fuses the expand
    into the matmul operand. Adapters/biases stay float32 (QLoRA recipe;
    the reference's QwenB.py:100-136 NF4 base + f32 LoRA)."""

    features: int
    rank: int = 0
    alpha: float = 16.0
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    quant: str | None = None
    # required only for parameter-surface mode (__call__(None)); normally
    # inferred from x
    in_features: int | None = None

    @nn.compact
    def __call__(self, x):
        from .quant import (
            NF4_BLOCK,
            dequant_int8,
            dequant_int8_block,
            dequant_nf4,
            matmul_int8_block,
        )

        in_f = x.shape[-1] if x is not None else self.in_features
        base_matmul = None  # int8b computes y directly (kernel never materializes)
        if self.quant == "int8":
            q = self.param("kernel_q", nn.initializers.zeros, (in_f, self.features), jnp.int8)
            s = self.param("kernel_scale", nn.initializers.ones, (self.features,), jnp.float32)
            kernel_c = dequant_int8(q, s, self.dtype)
        elif self.quant == "int8b":
            # blockwise int8 — the NF4 serving layout (quant.recode_nf4_to_
            # int8_block): carries exact NF4 levels; the decode matmul runs
            # the block-partial ordering (quant.matmul_int8_block) so the
            # weight stream is 1 byte/param — blockwise scales cannot be
            # hoisted out of a dense dot and would otherwise materialize
            # the f32 kernel every step
            q = self.param("kernel_q", nn.initializers.zeros, (in_f, self.features), jnp.int8)
            s = self.param(
                "kernel_scale",
                nn.initializers.ones,
                (in_f // NF4_BLOCK, self.features),
                jnp.float32,
            )
            if x is None:
                kernel_c = dequant_int8_block(q, s, self.dtype)
            else:
                kernel_c = None
                base_matmul = lambda xx: matmul_int8_block(xx, q, s, self.dtype)
        elif self.quant == "nf4":
            q = self.param(
                "kernel_q", nn.initializers.zeros, (in_f // 2, self.features), jnp.uint8
            )
            s = self.param(
                "kernel_scale",
                nn.initializers.ones,
                (in_f // NF4_BLOCK, self.features),
                jnp.float32,
            )
            kernel_c = dequant_nf4(q, s, self.dtype)
        else:
            kernel = self.param("kernel", self.kernel_init, (in_f, self.features), jnp.float32)
            kernel_c = kernel.astype(self.dtype)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if self.rank > 0:
            a = self.param(
                "lora_a",
                nn.initializers.normal(stddev=1.0 / self.rank),
                (in_f, self.rank),
                jnp.float32,
            )
            b = self.param("lora_b", nn.initializers.zeros, (self.rank, self.features), jnp.float32)
        else:
            a = b = None
        if x is None:
            # parameter-surface mode: callers that fuse several projections
            # into one matmul (models.llm fused_qkv) read the weights here so
            # the tree layout/initializers stay byte-identical to the
            # unfused module
            return kernel_c, bias, a, b
        y = base_matmul(x) if base_matmul is not None else jnp.dot(x, kernel_c)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        if a is not None:
            scale = self.alpha / self.rank
            y = y + scale * jnp.dot(jnp.dot(x, a.astype(self.dtype)), b.astype(self.dtype))
        return y


def lora_param_mask(params) -> dict:
    """Pytree of bools: True for LoRA adapter leaves (lora_a/lora_b) —
    feeds ``optax.masked`` so only adapters train, the PEFT contract."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_lora(path) -> bool:
        return any(getattr(k, "key", None) in ("lora_a", "lora_b") for k in path)

    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, [is_lora(p) for p, _ in flat])


def merge_lora(params):
    """Fold adapters into base kernels (deployment export — the reference
    pushes merged/adapter weights to the Hub, QwenA.py:558-567)."""

    def merge(d):
        if isinstance(d, dict):
            if "lora_a" in d and "lora_b" in d and "kernel" in d:
                rank = d["lora_a"].shape[-1]
                scale = 16.0 / rank
                new = dict(d)
                new["kernel"] = d["kernel"] + scale * d["lora_a"] @ d["lora_b"]
                new["lora_a"] = jnp.zeros_like(d["lora_a"])
                new["lora_b"] = jnp.zeros_like(d["lora_b"])
                return new
            return {k: merge(v) for k, v in d.items()}
        return d

    return merge(params)
