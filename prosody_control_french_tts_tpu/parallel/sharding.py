"""Parameter sharding policies (megatron-style tensor parallelism).

Maps the DecoderLM parameter tree onto a ("data", "model") mesh:

- embed [V, D]                → P(None, "model")   (D sharded; gathered once)
- attn q/k/v kernels [D, H·d] → P(None, "model")   (column parallel)
- attn o kernel [H·d, D]      → P("model", None)   (row parallel → psum)
- mlp gate/up [D, F]          → P(None, "model")
- mlp down [F, D]             → P("model", None)
- lm_head [D, V]              → P(None, "model")   (vocab-sharded logits)
- norms/bias/LoRA A/B         → replicated (adapters are tiny; replicating
  them keeps the optimizer states replicated too, the standard LoRA-TP
  deployment)

XLA inserts the all-reduce after row-parallel matmuls and the all-gather
for vocab-sharded logits from these annotations alone — the framework
never writes a collective for the LLM path by hand.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL = {"q", "k", "v", "gate", "up"}
_ROW = {"o", "down"}


def _spec_for(path: tuple[str, ...], shape: tuple[int, ...]) -> P:
    names = [getattr(k, "key", str(k)) for k in path]
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    if leaf in ("lora_a", "lora_b", "scale", "bias"):
        return P()
    if leaf == "embedding":
        return P(None, "model")
    if leaf == "kernel":
        if parent in _COL:
            return P(None, "model")
        if parent in _ROW:
            return P("model", None)
        if parent == "lm_head":
            return P(None, "model")
        return P()
    if leaf == "kernel_q":
        # quantized storage (models.quant): int8 [in, out] and NF4-packed
        # [in/2, out] both keep the kernel's row/column orientation
        return P(None, "model") if parent in _COL else P("model", None) if parent in _ROW else P()
    if leaf == "kernel_scale":
        if len(shape) == 1:  # int8 per-output-channel scale [out]
            return P("model") if parent in _COL else P()
        # nf4 blockwise scale [in/block, out] follows the kernel layout
        return P(None, "model") if parent in _COL else P("model", None) if parent in _ROW else P()
    return P()


def llm_param_spec(params) -> dict:
    """Pytree of PartitionSpec matching ``params``."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = [_spec_for(path, leaf.shape) for path, leaf in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], specs)


def shard_params(params, mesh: Mesh):
    """Device_put params with the policy's NamedShardings."""
    specs = llm_param_spec(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
