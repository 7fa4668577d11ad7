"""Regression tests for the round-3 self-review findings:

1. a previous identity-denoise run leaves ``segment_denoised.wav``
   HARDLINKED to the raw recording — a later denoising run must never
   truncate the original through the shared inode (data loss) and the
   copy-fallback must not crash on SameFileError;
2. full-scale negative samples (−32768 ↔ −1.0) are exactly representable
   and must NOT disqualify a corpus from the lossless int16 transfer path;
3. malformed ``PCFT_DATA_MESH`` fails fast with a clear configuration
   error instead of an unhandled ValueError mid-pipeline.
"""

import os

import numpy as np
import pytest

from prosody_control_french_tts_tpu.ops import pcm


class TestPcmExactness:
    def test_full_scale_negative_accepted(self):
        x = np.array([-1.0, 1.0 - 1.0 / 32768.0, 0.0, 0.5], np.float32)
        q = pcm.f32_to_i16_exact(x)
        assert q is not None and q.dtype == np.int16
        assert q[0] == -32768 and q[1] == 32767
        np.testing.assert_array_equal(pcm.i16_to_f32(q), x)

    def test_overflow_rejected(self):
        assert pcm.f32_to_i16_exact(np.array([1.0], np.float32)) is None  # +32768 unrepresentable
        assert pcm.f32_to_i16_exact(np.array([-1.0 - 1 / 32768], np.float32)) is None

    def test_inexact_rejected(self):
        assert pcm.f32_to_i16_exact(np.array([0.1], np.float32)) is None

    def test_int16_corpus_with_full_scale_sample_stays_int16(self):
        from prosody_control_french_tts_tpu.prosody.measure import _as_int16_if_lossless

        x = (np.random.default_rng(0).integers(-32768, 32768, size=(2, 4000))
             .astype(np.float32) / np.float32(32768.0))
        x[0, 0] = -1.0  # the adversarial full-scale sample
        assert x.min() == -1.0
        out = _as_int16_if_lossless(x)
        assert out.dtype == np.int16


class TestRangeSumLocalPrecision:
    def test_matches_f64_oracle_on_random_windows(self):
        import jax.numpy as jnp

        from prosody_control_french_tts_tpu.ops.cumsum import CHUNK, ChunkedCumsum

        rng = np.random.default_rng(5)
        x = rng.standard_normal(6 * CHUNK + 123).astype(np.float32)
        cs = ChunkedCumsum.build(jnp.asarray(x))
        ref = np.cumsum(np.concatenate([[0.0], x.astype(np.float64)]))
        W = 3 * CHUNK + 7
        lo = np.array([0, 1, CHUNK - 1, CHUNK, 2 * CHUNK + 5, x.size - W, x.size - 1], np.int32)
        hi = np.minimum(lo + rng.integers(0, W, size=lo.size).astype(np.int32), x.size)
        got = np.asarray(cs.range_sum_local(jnp.asarray(lo), jnp.asarray(hi), W))
        want = ref[hi] - ref[lo]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_quiet_window_after_loud_hour_scale_prefix(self):
        """The global-prefix difference loses a quiet window entirely once
        the f32 cumsum magnitude dwarfs it; the local form must not."""
        import jax.numpy as jnp

        from prosody_control_french_tts_tpu.ops.cumsum import ChunkedCumsum

        T = 1 << 21  # power sum reaches ~2.1e6 → f32 ulp 0.25
        x = np.ones(T, np.float32)
        x[-50_000:] = 1e-3
        cs = ChunkedCumsum.build(jnp.asarray(np.square(x)))
        W = 44_100
        lo, hi = T - W - 100, T - 100
        true = W * 1e-6
        local = float(np.asarray(cs.range_sum_local(jnp.asarray([lo]), jnp.asarray([hi]), W + 1))[0])
        assert abs(local - true) / true < 1e-3
        # (the global form's error at this magnitude is ~0.25/0.044 ≈ 500 % —
        # documented motivation, not asserted, since it could round either way)


class TestDenoiseHardlinkSafety:
    def _voice(self, tmp_path, denoise=None):
        from prosody_control_french_tts_tpu.core.config import PipelineConfig

        cfg = {
            "data_dir": "Data/voice",
            "out_dir": "Out",
            "voice_names": ["v"],
            "tts_backend": "fake",
            "aligner": "energy",
            "silence": {"min_silence_len": 500, "silence_thresh": -50, "keep_silence": 100},
        }
        if denoise:
            cfg["denoise"] = denoise
        brute = tmp_path / "Data" / "voice" / "v" / "brute"
        brute.mkdir(parents=True, exist_ok=True)
        return PipelineConfig.from_dict(cfg, tmp_path), brute / "segment.wav"

    def test_denoise_after_identity_run_preserves_original(self, tmp_path):
        from prosody_control_french_tts_tpu.core.pipeline import AudioPipeline
        from prosody_control_french_tts_tpu.tts.fake import FakeBackend
        from prosody_control_french_tts_tpu.utils.wavio import read_wav, write_wav

        rng = np.random.default_rng(1)
        sig = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        cfg, brute = self._voice(tmp_path)
        write_wav(brute, sig, 16000)
        original = brute.read_bytes()

        AudioPipeline("v", cfg, tts=FakeBackend(seed=1)).preprocess()  # identity → hardlink
        denoised = brute.parent / "segment_denoised.wav"
        assert denoised.exists()

        cfg2, _ = self._voice(tmp_path, denoise="spectral")
        AudioPipeline("v", cfg2, tts=FakeBackend(seed=1)).preprocess()
        # the raw recording must be byte-identical — a truncating write
        # through a stale hardlink would have destroyed it
        assert brute.read_bytes() == original
        den = np.asarray(read_wav(denoised).to_mono().samples, np.float32)
        orig = np.asarray(read_wav(brute).to_mono().samples, np.float32)
        assert not np.array_equal(den, orig)  # spectral gate actually ran


class TestDataMeshEnvGuard:
    def test_malformed_env_raises_config_error(self):
        import jax

        from prosody_control_french_tts_tpu.parallel.mesh import production_data_mesh

        jax.devices()  # ensure backend up before touching the cache path
        old = os.environ.get("PCFT_DATA_MESH")
        os.environ["PCFT_DATA_MESH"] = "all"
        try:
            with pytest.raises(ValueError, match="PCFT_DATA_MESH"):
                production_data_mesh()
        finally:
            if old is None:
                os.environ.pop("PCFT_DATA_MESH", None)
            else:
                os.environ["PCFT_DATA_MESH"] = old


class TestGreedyCapAttentionRow:
    """Round-3 external-review finding: when greedy decode hits the
    max_new cap without emitting eot, the final token's cross-attention
    row (row max_new) was never written by the while_loop — the last
    word's DTW input was all-zero."""

    def test_final_att_row_written_at_cap(self):
        import jax

        from prosody_control_french_tts_tpu.align.whisper_jax import (
            WhisperConfig,
            WhisperModel,
            make_greedy_fn,
        )

        cfg = WhisperConfig.test()
        model = WhisperModel(cfg)
        mel = np.random.default_rng(0).standard_normal((1, 40, cfg.n_mels)).astype(np.float32)
        params = model.init(
            jax.random.PRNGKey(0), jnp_mel := np.asarray(mel), np.zeros((1, 2), np.int32)
        )
        max_new = 4
        fn = make_greedy_fn(model, max_new)
        # eot_id = -1 never matches any argmax token → decode runs to the cap
        tokens, att = fn(params, jnp_mel, 0, -1, np.ones((1,), bool))
        att = np.asarray(att)
        assert att.shape[1] == max_new + 1
        # every row 1..max_new (the text tokens' DTW inputs) must be written
        for r in range(1, max_new + 1):
            assert np.abs(att[0, r]).sum() > 0, f"attention row {r} is all-zero"


class TestBatchedDTWBucketing:
    """Frame/batch bucketing in spans_from_attention_batch must be exact:
    padded columns/rows never change a real item's spans (the DP's
    documented prefix property)."""

    def test_batch_matches_solo_on_ragged_widths(self):
        from prosody_control_french_tts_tpu.align.whisper_jax import (
            spans_from_attention,
            spans_from_attention_batch,
        )

        rng = np.random.default_rng(7)
        ws = [
            np.abs(rng.standard_normal((3, 37))).astype(np.float32),
            np.abs(rng.standard_normal((17, 211))).astype(np.float32),
            np.abs(rng.standard_normal((1, 300))).astype(np.float32),
        ]
        batched = spans_from_attention_batch(ws)
        for w, got in zip(ws, batched):
            np.testing.assert_allclose(got, spans_from_attention(w), atol=1e-6)


class TestAlignBatchLengthGuard:
    def test_transcripts_length_mismatch_raises(self):
        from prosody_control_french_tts_tpu.align.whisper_jax import WhisperAligner
        from prosody_control_french_tts_tpu.utils.wavio import Audio

        al = WhisperAligner.__new__(WhisperAligner)  # no weights needed: guard fires first
        clips = [Audio(np.zeros(1600, np.float32), 16000)] * 2
        with pytest.raises(ValueError, match="transcripts"):
            al.align_batch(clips, [None])


class TestPrefetchShapeValidation:
    """A prefetched device buffer whose row count no longer matches the
    host corpus (mesh config changed between prefetch and consume) must be
    dropped, not used verbatim."""

    def test_stale_pre_is_reloaded(self):
        import jax.numpy as jnp

        from prosody_control_french_tts_tpu.prosody.measure import _corpus_to_device

        host = np.ones((5, 16), np.float32)
        stale = jnp.zeros((3, 16), jnp.float32)  # wrong row count
        out = _corpus_to_device([host], pre=[stale])[0]
        assert out.shape == (5, 16)
        np.testing.assert_array_equal(np.asarray(out), host)

    def test_matching_pre_is_reused(self):
        import jax.numpy as jnp

        from prosody_control_french_tts_tpu.prosody.measure import _corpus_to_device

        host = np.ones((4, 8), np.float32)
        pre = jnp.full((4, 8), 7.0)
        out = _corpus_to_device([host], pre=[pre])[0]
        np.testing.assert_array_equal(np.asarray(out), np.full((4, 8), 7.0))


class TestSegmentPrefetchAssembly:
    """Per-segment streaming prefetch (prosody.measure.prefetch_segment):
    rows uploaded one-by-one during synthesis must assemble on device into
    a batch BIT-IDENTICAL to the compact whole-corpus upload, and any
    staleness (rewritten file) must fall back to the upload path."""

    @pytest.fixture()
    def corpus(self, tmp_path):
        from prosody_control_french_tts_tpu.utils.native_audio import available
        from prosody_control_french_tts_tpu.utils.wavio import Audio, write_wav

        if not available():
            pytest.skip("native audio loader unavailable")
        rng = np.random.default_rng(7)
        paths = []
        for i, n in enumerate((1600, 2400, 900)):
            a = (rng.integers(-3000, 3000, n).astype(np.float32)) / 32768.0
            p = tmp_path / f"seg{i}.wav"
            write_wav(p, Audio(a, 16000))
            paths.append(p)
        return paths

    def test_assembled_batch_bit_identical(self, corpus):
        from prosody_control_french_tts_tpu.prosody import measure as M

        M._SEG_PREFETCH.clear()
        for p in corpus:
            M.prefetch_segment(p, rate_expect=16000)
        assert len(M._SEG_PREFETCH) == len(corpus)
        host = M._load_padded(corpus, rate_expect=16000)
        dev = M._assemble_from_segments(corpus, host, 16000)
        assert dev is not None and dev.dtype == np.int16
        np.testing.assert_array_equal(np.asarray(dev), host[0])

    def test_prefetch_corpus_uses_assembly(self, corpus, monkeypatch):
        from prosody_control_french_tts_tpu.prosody import measure as M

        M._SEG_PREFETCH.clear()
        M._PREFETCH.clear()
        for p in corpus:
            M.prefetch_segment(p, rate_expect=16000)
        calls = []
        orig = M._corpus_to_device
        monkeypatch.setattr(
            M, "_corpus_to_device", lambda *a, **k: calls.append(1) or orig(*a, **k)
        )
        M.prefetch_corpus(corpus, rate_expect=16000)
        assert not calls, "assembly path should not re-upload the corpus"
        (hostb, lens, rate, ok), dev = next(iter(M._PREFETCH.values()))
        np.testing.assert_array_equal(np.asarray(dev), hostb)

    def test_rewritten_file_falls_back(self, corpus):
        from prosody_control_french_tts_tpu.prosody import measure as M
        from prosody_control_french_tts_tpu.utils.wavio import Audio, write_wav

        M._SEG_PREFETCH.clear()
        for p in corpus:
            M.prefetch_segment(p, rate_expect=16000)
        # rewrite one file (different content AND length -> new key)
        write_wav(corpus[1], Audio(np.zeros(500, np.float32), 16000))
        host = M._load_padded(corpus, rate_expect=16000)
        assert M._assemble_from_segments(corpus, host, 16000) is None

    def test_float_corpus_falls_back(self, corpus, tmp_path):
        from prosody_control_french_tts_tpu.prosody import measure as M

        M._SEG_PREFETCH.clear()
        for p in corpus:
            M.prefetch_segment(p, rate_expect=16000)
        host = M._load_padded(corpus, rate_expect=16000)
        fhost = (M.pcm.i16_to_f32_np(host[0]) if hasattr(M.pcm, "i16_to_f32_np") else host[0].astype(np.float32) / 32768.0,) + host[1:]
        assert M._assemble_from_segments(corpus, fhost, 16000) is None
