"""Pallas decode-attention kernel (ops/decode_attn) vs the XLA reference.

The kernel owns the serving KV-cache layout ([B, S, kv_heads*hd] packed);
interpret mode runs the actual kernel body on CPU so these tests pin the
kernel's math, not just the dispatch wrapper.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from prosody_control_french_tts_tpu.ops.decode_attn import (
    _pallas_call,
    decode_attention,
    decode_attention_reference,
)


def _mk(B=4, H=14, KV=2, hd=64, S=96, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, hd)), dtype)
    kc = jnp.asarray(rng.standard_normal((B, S, KV * hd)), dtype)
    vc = jnp.asarray(rng.standard_normal((B, S, KV * hd)), dtype)
    return q, kc, vc


class TestDecodeAttnKernel:
    @pytest.mark.parametrize("pos", [0, 1, 50, 95])
    def test_parity_f32(self, pos):
        q, kc, vc = _mk()
        got = _pallas_call(q, kc, vc, pos, 2, True)
        ref = decode_attention_reference(q, kc, vc, pos, 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_parity_bf16(self):
        q, kc, vc = _mk(dtype=jnp.bfloat16)
        got = _pallas_call(q, kc, vc, 70, 2, True)
        ref = decode_attention_reference(q, kc, vc, 70, 2)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=0.02, atol=0.02
        )

    def test_mask_blocks_future_rows(self):
        """Rows past pos must not influence the output at all."""
        q, kc, vc = _mk(S=32)
        pos = 10
        base = np.asarray(_pallas_call(q, kc, vc, pos, 2, True))
        kc2 = kc.at[:, pos + 1 :, :].set(1e4)
        vc2 = vc.at[:, pos + 1 :, :].set(-1e4)
        got = np.asarray(_pallas_call(q, kc2, vc2, pos, 2, True))
        np.testing.assert_array_equal(base, got)

    def test_pos_zero_returns_first_value_row(self):
        """pos=0 attends to exactly one row: out == v[0] per kv head."""
        q, kc, vc = _mk(B=2, S=16)
        got = np.asarray(_pallas_call(q, kc, vc, 0, 2, True))  # [B, H, hd]
        v0 = np.asarray(vc[:, 0, :]).reshape(2, 2, 64)
        want = np.repeat(v0, 7, axis=1)  # kv-major grouping of q heads
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    def test_single_kv_head(self):
        q, kc, vc = _mk(H=4, KV=1, hd=64, S=48)
        got = _pallas_call(q, kc, vc, 30, 1, True)
        ref = decode_attention_reference(q, kc, vc, 30, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_dispatch_cpu_uses_reference(self):
        q, kc, vc = _mk(B=2, S=16)
        got = decode_attention(q, kc, vc, 7, 2)
        ref = decode_attention_reference(q, kc, vc, 7, 2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
