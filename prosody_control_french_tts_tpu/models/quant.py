"""Weight-only quantization for the LLM stack (QwenB parity).

The reference's stage-B model loads Qwen2.5-7B in 4-bit NF4 via
bitsandbytes (Code/ssml_models/cascading_model/QwenB.py:100-113 —
BitsAndBytesConfig(load_in_4bit=True, bnb_4bit_quant_type="nf4",
bnb_4bit_compute_dtype=bfloat16)). TPU-native equivalent: weights are
STORED quantized in the parameter tree (int8 per-output-channel, or
NF4-codebook 4-bit blockwise packed two-per-byte) and dequantized to the
compute dtype inside the jitted program, where XLA fuses the dequant into
the consuming matmul's operand read. LoRA adapters, biases and norms stay
float32 (the QLoRA recipe: quantized base, full-precision adapters).

Why it matters on one v5e chip: 7B bf16 weights ≈ 15.2 GB exceed the
16 GB HBM once KV caches exist; int8 ≈ 7.6 GB and NF4 ≈ 3.8 GB fit with
room for serving batch.

``quantize_params`` converts a float tree (hermetically trained, or ported
via models.port_weights.qwen2_to_flax) into the tree that
``DecoderLM(LLMConfig(quant=...))`` expects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# The QLoRA NF4 codebook: 16 quantiles of N(0,1) normalised to [-1, 1]
# (public constants from the QLoRA paper / bitsandbytes).
NF4_TABLE = np.array(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.44070982933044434,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    np.float32,
)

NF4_BLOCK = 64  # bitsandbytes' default blocksize

# LoRADense projection names inside DecoderLM — the quantized set
# (embed/lm_head stay in compute dtype, like the reference's skip_modules)
_PROJ_NAMES = {"q", "k", "v", "o", "gate", "up", "down"}


# ---------------------------------------------------------------------------
# int8: per-output-channel absmax
# ---------------------------------------------------------------------------


def quantize_kernel_int8(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """f32 [in, out] → (int8 [in, out], f32 scale [out]) with symmetric
    per-output-channel absmax scaling."""
    w = np.asarray(w, np.float32)
    scale = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
    q = np.clip(np.rint(w / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def dequant_int8(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    """Jittable dequant — elementwise, fusable into the consuming dot."""
    return (q.astype(jnp.float32) * scale[None, :].astype(jnp.float32)).astype(dtype)


# ---------------------------------------------------------------------------
# int8b: blockwise int8 — the NF4 *serving* layout
# ---------------------------------------------------------------------------


def quantize_kernel_int8_block(
    w: np.ndarray, block: int = NF4_BLOCK
) -> tuple[np.ndarray, np.ndarray]:
    """f32 [in, out] → (int8 [in, out], f32 scale [in/block, out]) with
    symmetric absmax per (contraction-block, output-column) — the direct
    quantizer for the int8b serving layout (recode_nf4_to_int8_block
    produces the same layout FROM an NF4 checkpoint; this one quantizes a
    float kernel straight to it, for serving stages fine-tuned in float)."""
    w = np.asarray(w, np.float32)
    in_f, out_f = w.shape
    if in_f % block:
        raise ValueError(f"in_features {in_f} not divisible by block {block}")
    wb = w.reshape(in_f // block, block, out_f)
    scale = np.maximum(np.abs(wb).max(axis=1), 1e-12) / 127.0  # [nb, out]
    q = np.clip(np.rint(wb / scale[:, None, :]), -127, 127).astype(np.int8)
    return q.reshape(in_f, out_f), scale.astype(np.float32)


def dequant_int8_block(
    q: jnp.ndarray, scale: jnp.ndarray, dtype, block: int = NF4_BLOCK
) -> jnp.ndarray:
    """Jittable blockwise dequant: int8 [in, out] × f32 scale [in/block, out]
    → dtype [in, out]. One convert + one broadcast multiply per element —
    the same weight-stream cost as the per-channel int8 path."""
    in_f, out_f = q.shape
    w = q.astype(jnp.float32).reshape(in_f // block, block, out_f) * scale[:, None, :]
    return w.reshape(in_f, out_f).astype(dtype)


def matmul_int8_block(
    x: jnp.ndarray,
    q: jnp.ndarray,
    scale: jnp.ndarray,
    dtype,
    block: int = NF4_BLOCK,
    row_cutoff: int = 256,
) -> jnp.ndarray:
    """``x @ dequant_int8_block(q, scale)`` without materializing the kernel.

    Blockwise scales sit on the CONTRACTION axis, so XLA cannot hoist them
    out of a dense dot the way it rewrites per-channel scales
    (x@(c·s) → (x@c)·s); the dequantized kernel materializes in HBM and the
    decode weight stream becomes ~5 bytes/param instead of 1 (measured on
    the v5e at the 7B up-proj shape: 0.44 ms vs 0.18 for per-channel int8).
    For small row counts (decode) reorder the contraction instead: a
    batched ``block``-deep dot over the scale blocks, scales applied to the
    per-block partial sums — XLA fuses that epilogue and the stream runs at
    427 GB/s vs codes, FASTER than the per-channel layout (383 GB/s) at the
    same shape. Large row counts (prefill / training) fall back to the
    dense dequant: the partial tensor would be [nb, R, out] and those
    passes are MXU-bound anyway.

    Numerics: the partial path is *more* accurate than the dense one — the
    int8 codes convert to bf16 exactly and the f32 scales apply to f32
    partial sums, instead of rounding every dequantized weight to bf16."""
    in_f, out_f = q.shape
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= int(d)
    if rows > row_cutoff or in_f % block:
        return jnp.dot(x, dequant_int8_block(q, scale, dtype, block))
    nb = in_f // block
    xb = x.reshape(rows, nb, block).swapaxes(0, 1).astype(dtype)  # [nb, R, blk]
    qb = q.reshape(nb, block, out_f).astype(dtype)  # [nb, blk, out]
    part = jax.lax.dot_general(
        xb, qb, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [nb, R, out]
    y = (part * scale[:, None, :].astype(jnp.float32)).sum(0)
    return y.astype(dtype).reshape(*lead, out_f)


def quantize_kernel_nf4(w: np.ndarray, block: int = NF4_BLOCK) -> tuple[np.ndarray, np.ndarray]:
    """f32 [in, out] → (uint8 packed [in/2, out], f32 scale [in/block, out]).

    Blocks run along the input dim (contraction axis). Codes are argmin
    distance to the NF4 table of w/absmax(block); rows 2i (low nibble) and
    2i+1 (high nibble) pack into byte i."""
    w = np.asarray(w, np.float32)
    in_f, out_f = w.shape
    if in_f % block or in_f % 2:
        raise ValueError(f"in_f {in_f} must be divisible by block {block} (and 2)")
    blocks = w.reshape(in_f // block, block, out_f)
    scale = np.maximum(np.abs(blocks).max(axis=1), 1e-12)  # [in/block, out]
    normed = blocks / scale[:, None, :]
    codes = np.abs(normed.reshape(in_f, out_f)[..., None] - NF4_TABLE).argmin(-1).astype(np.uint8)
    packed = (codes[0::2] | (codes[1::2] << 4)).astype(np.uint8)
    return packed, scale.astype(np.float32)


def _nf4_lookup(codes: jnp.ndarray) -> jnp.ndarray:
    """Exact 16-entry codebook lookup as a balanced bit-test selection
    tree (15 elementwise selects) instead of jnp.take: a gather over
    billions of codes lowers pathologically on the TPU toolchain (the 7B
    NF4 decode measured 296 ms/step gather-bound vs ~12 ms for int8),
    while selects fuse into the consuming dot at full VPU rate."""
    t = NF4_TABLE

    def level(lo: int, hi: int, bit: int):
        if lo == hi:
            return jnp.float32(t[lo])
        mid = (lo + hi + 1) // 2
        b = (codes >> jnp.uint8(bit)) & jnp.uint8(1)
        return jnp.where(b == 1, level(mid, hi, bit - 1), level(lo, mid - 1, bit - 1))

    return level(0, 15, 3)


def dequant_nf4(
    packed: jnp.ndarray, scale: jnp.ndarray, dtype, block: int = NF4_BLOCK
) -> jnp.ndarray:
    """Jittable: unpack nibbles → codebook lookup → blockwise rescale.
    The scale multiply broadcasts over a [in/block, block, out] view
    rather than jnp.repeat (which would materialize a full-kernel f32
    array — 4 bytes/param of pure HBM traffic on the weight stream)."""
    half, out_f = packed.shape
    in_f = half * 2
    lo = packed & jnp.uint8(0xF)
    hi = (packed >> jnp.uint8(4)) & jnp.uint8(0xF)
    codes = jnp.stack([lo, hi], axis=1).reshape(in_f, out_f)
    w = _nf4_lookup(codes)
    w = w.reshape(in_f // block, block, out_f) * scale[:, None, :].astype(jnp.float32)
    return w.reshape(in_f, out_f).astype(dtype)


# NF4 levels on the int8 grid (|round(t*127) - t*127| ≤ 0.5 → value error
# ≤ 0.5/127 ≈ 0.4 % of block absmax, far inside NF4's own ~3 % step size)
NF4_INT8_TABLE = np.rint(NF4_TABLE * 127.0).astype(np.int8)


def recode_nf4_to_int8_block(
    packed: np.ndarray, scale: np.ndarray, block: int = NF4_BLOCK
) -> tuple[np.ndarray, np.ndarray]:
    """One-time load recode of an NF4 kernel into the int8b serving layout.

    Rationale (measured on the v5e, round 4): streaming NF4 natively means
    a 16-entry codebook lookup per weight per token. A gather lowers
    pathologically (296 ms/step on the 7B), and the exact 15-select tree is
    VPU-bound at ~37 ms/step (27 tok/s) — the VPU, not HBM, becomes the
    decode bottleneck, while the int8 stream runs at 0.74 of HBM peak
    (685 tok/s). Mapping the 16 NF4 levels onto the int8 grid once at load
    (host-side, per-kernel) buys back the int8 stream rate for a 2× memory
    cost (7.6 GB vs 3.8 GB on the 7B — both fit the 16 GB chip) and a
    bounded ≤0.4 %-of-absmax representation error. Serving parity with the
    reference's NF4 bitsandbytes deploy (QwenB.py:100-113) is therefore:
    NF4 on disk / int8b on the wire."""
    packed = np.asarray(packed)
    scale = np.asarray(scale, np.float32)
    half, out_f = packed.shape
    lo = packed & np.uint8(0xF)
    hi = packed >> np.uint8(4)
    codes = np.stack([lo, hi], axis=1).reshape(half * 2, out_f)
    return NF4_INT8_TABLE[codes], scale / 127.0


def recode_params_nf4_serving(params, block: int = NF4_BLOCK):
    """Walk a quantized tree converting every NF4 kernel (uint8 packed
    kernel_q) to the int8b serving layout; int8/float leaves pass through.
    Use with ``LLMConfig(quant="int8b")``."""

    def walk(node):
        if isinstance(node, dict):
            if "kernel_q" in node and np.asarray(node["kernel_q"]).dtype == np.uint8:
                out = {k: v for k, v in node.items() if k not in ("kernel_q", "kernel_scale")}
                q, s = recode_nf4_to_int8_block(node["kernel_q"], node["kernel_scale"], block)
                out["kernel_q"] = jnp.asarray(q)
                out["kernel_scale"] = jnp.asarray(s)
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


# ---------------------------------------------------------------------------
# tree conversion
# ---------------------------------------------------------------------------


def quantize_params(params, mode: str, block: int = NF4_BLOCK):
    """Float DecoderLM tree → quantized tree: every LoRADense projection's
    "kernel" becomes ("kernel_q", "kernel_scale"); everything else (biases,
    adapters, norms, embed, lm_head) passes through unchanged."""
    if mode not in ("int8", "nf4"):
        raise ValueError(f"unknown quant mode {mode!r}")

    def walk(node, name=""):
        if isinstance(node, dict):
            if name in _PROJ_NAMES and "kernel" in node:
                out = {k: v for k, v in node.items() if k != "kernel"}
                w = np.asarray(node["kernel"], np.float32)
                if mode == "int8":
                    q, s = quantize_kernel_int8(w)
                else:
                    q, s = quantize_kernel_nf4(w, block)
                out["kernel_q"] = jnp.asarray(q)
                out["kernel_scale"] = jnp.asarray(s)
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params)


def dequantize_params(params, block: int = NF4_BLOCK):
    """Inverse of ``quantize_params``: expand every ("kernel_q",
    "kernel_scale") pair back to a float32 "kernel" (mode inferred from the
    storage dtype: int8 → per-channel, uint8 → NF4 packed). Running the
    FLOAT model on this tree must reproduce the quantized model's outputs
    exactly — the correctness contract tests/test_quant.py checks."""

    def walk(node):
        if isinstance(node, dict):
            if "kernel_q" in node:
                out = {k: v for k, v in node.items() if k not in ("kernel_q", "kernel_scale")}
                q, s = node["kernel_q"], node["kernel_scale"]
                if np.asarray(q).dtype == np.int8:
                    if np.asarray(s).ndim == 2:  # int8b blockwise serving layout
                        w = dequant_int8_block(jnp.asarray(q), jnp.asarray(s), jnp.float32, block)
                    else:
                        w = dequant_int8(jnp.asarray(q), jnp.asarray(s), jnp.float32)
                else:
                    w = dequant_nf4(jnp.asarray(q), jnp.asarray(s), jnp.float32, block)
                out["kernel"] = w
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def quantized_bytes(params) -> int:
    """Total parameter-tree bytes (the footprint figure for BENCH)."""
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
