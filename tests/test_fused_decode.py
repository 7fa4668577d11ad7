"""Fused serving path (models/llm.fuse_decode_params + greedy_generate_fused):
exact parity with the training-layout DecoderLM, LoRA fold correctness, and
dtype behaviour. The serving transform the decode bench relies on."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prosody_control_french_tts_tpu.models.llm import (
    DecoderLM,
    LLMConfig,
    _fused_forward,
    fuse_decode_params,
    greedy_generate,
    greedy_generate_fused,
    init_kv_caches,
    init_kv_caches_fused,
)


@pytest.fixture(scope="module")
def tiny_f32():
    cfg = dataclasses.replace(LLMConfig.tiny(), dtype=jnp.float32)
    model = DecoderLM(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, size=(3, 8)), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), ids[:, :1], positions=jnp.zeros((3, 1), jnp.int32)
    )
    return cfg, model, params, ids


class TestFusedParity:
    def test_logits_exact_at_f32(self, tiny_f32):
        cfg, model, params, ids = tiny_f32
        pos = jnp.broadcast_to(jnp.arange(8), (3, 8))
        caches = init_kv_caches(cfg, 3, 16)
        ref, _ = model.apply(params, ids, positions=pos, kv_caches=caches, cache_pos=0)
        fp = fuse_decode_params(params, cfg, dtype=jnp.float32)
        got, _ = _fused_forward(fp, cfg, ids, pos, init_kv_caches_fused(cfg, 3, 16), 0)
        # the packed serving cache layout ([B,S,kv*hd]) reorders the
        # attention contractions — f32 reassociation only (observed
        # ≤1.5e-6 absolute); greedy tokens stay exactly equal (next test)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-5)

    def test_greedy_tokens_exact_at_f32(self, tiny_f32):
        cfg, model, params, ids = tiny_f32
        ref = np.asarray(greedy_generate(model, params, ids, max_new=10))
        fp = fuse_decode_params(params, cfg, dtype=jnp.float32)
        got = np.asarray(greedy_generate_fused(fp, cfg, ids, max_new=10))
        assert (ref == got).all()

    def test_lora_fold_changes_logits_after_training(self, tiny_f32):
        """A nonzero adapter must fold into the fused kernels: perturb
        lora_b, verify fused logits move WITH the adapter."""
        cfg, model, params, ids = tiny_f32
        pos = jnp.broadcast_to(jnp.arange(8), (3, 8))
        caches = init_kv_caches(cfg, 3, 16)
        perturbed = jax.tree_util.tree_map_with_path(
            lambda kp, x: x + 0.05
            if any(getattr(k, "key", None) == "lora_b" for k in kp)
            else x,
            params,
        )
        ref, _ = model.apply(perturbed, ids, positions=pos, kv_caches=caches, cache_pos=0)
        fp = fuse_decode_params(perturbed, cfg, dtype=jnp.float32)
        got, _ = _fused_forward(fp, cfg, ids, pos, init_kv_caches_fused(cfg, 3, 16), 0)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-5)
        base_fp = fuse_decode_params(params, cfg, dtype=jnp.float32)
        base, _ = _fused_forward(base_fp, cfg, ids, pos, init_kv_caches_fused(cfg, 3, 16), 0)
        assert np.abs(np.asarray(base) - np.asarray(got)).max() > 1e-3

    def test_bf16_tree_halves_weight_bytes(self, tiny_f32):
        cfg, model, params, ids = tiny_f32
        fp = fuse_decode_params(params, cfg)  # default bf16
        assert fp["embed"].dtype == jnp.bfloat16
        assert fp["layers"][0]["wqkv"].dtype == jnp.bfloat16
        # fused widths: q|k|v and gate|up concatenated
        hd = cfg.head_dim
        assert fp["layers"][0]["wqkv"].shape == (cfg.dim, (cfg.heads + 2 * cfg.kv_heads) * hd)
        assert fp["layers"][0]["wgu"].shape == (cfg.dim, 2 * cfg.ffn)
        # bf16 logits still close to the f32 reference on a scale-normalised
        # random model
        pos = jnp.broadcast_to(jnp.arange(8), (3, 8))
        caches = init_kv_caches(cfg, 3, 16)
        ref, _ = model.apply(params, ids, positions=pos, kv_caches=caches, cache_pos=0)
        got, _ = _fused_forward(fp, cfg, ids, pos, init_kv_caches_fused(cfg, 3, 16), 0)
        r = np.asarray(ref)
        err = np.abs(r - np.asarray(got)).max() / max(np.abs(r).max(), 1e-9)
        assert err < 0.05, err

    def test_quantized_tree_rejected(self):
        cfg = dataclasses.replace(LLMConfig.tiny(), quant="int8")
        model = DecoderLM(cfg)
        ids = jnp.zeros((1, 4), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        with pytest.raises(ValueError, match="quantized"):
            fuse_decode_params(params, cfg)


class TestQuantizedFusedDecode:
    """int8b weight stream over the fused serving tree
    (quantize_fused_decode_params): the bench-geometry decode roofline
    path. Contract: the quantized tree's outputs match the SAME fused
    forward run on the dense-dequantized weights — quantization error is
    fixed by the codes; the partial-sum path adds only f32 reassociation."""

    def _trees(self, tiny_f32, block=32):
        from prosody_control_french_tts_tpu.models.llm import (
            quantize_fused_decode_params,
        )
        from prosody_control_french_tts_tpu.models.quant import dequant_int8_block

        cfg, model, params, ids = tiny_f32
        fp = fuse_decode_params(params, cfg, dtype=jnp.float32)
        fq = quantize_fused_decode_params(fp, block=block)

        def deq(w):
            if isinstance(w, dict):
                return dequant_int8_block(w["codes"], w["scale"], jnp.float32, block)
            return w

        fdq = {
            **fq,
            "lm_head": deq(fq["lm_head"]),
            "layers": [{k: deq(v) for k, v in lw.items()} for lw in fq["layers"]],
        }
        return cfg, fq, fdq, ids

    def test_decode_step_matches_dequantized(self, tiny_f32):
        cfg, fq, fdq, ids = self._trees(tiny_f32)
        B = ids.shape[0]
        caches = init_kv_caches_fused(cfg, B, 16)
        caches = [(k.astype(jnp.float32), v.astype(jnp.float32)) for k, v in caches]
        pos = jnp.full((B, 1), 0)
        ref, _ = _fused_forward(fdq, cfg, ids[:, :1], pos, caches, 0)
        got, _ = _fused_forward(fq, cfg, ids[:, :1], pos, caches, 0)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-4, atol=1e-4)

    def test_greedy_tokens_match_dequantized(self, tiny_f32):
        cfg, fq, fdq, ids = self._trees(tiny_f32)
        ref = np.asarray(greedy_generate_fused(fdq, cfg, ids, max_new=10))
        got = np.asarray(greedy_generate_fused(fq, cfg, ids, max_new=10))
        assert (ref == got).all()

    def test_stream_bytes_near_one_per_param(self, tiny_f32):
        from prosody_control_french_tts_tpu.models.llm import (
            quantize_fused_decode_params,
        )

        cfg, model, params, ids = tiny_f32
        fp = fuse_decode_params(params, cfg, dtype=jnp.float32)
        fq = quantize_fused_decode_params(fp, block=32)
        w = fq["layers"][0]["wqkv"]
        assert w["codes"].dtype == jnp.int8
        assert w["scale"].shape == (w["codes"].shape[0] // 32, w["codes"].shape[1])
