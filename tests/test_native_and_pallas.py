"""Native C++ audio runtime + Pallas kernel tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from prosody_control_french_tts_tpu.utils import native_audio, wavio


@pytest.fixture(scope="module")
def native():
    if not native_audio.ensure_built():
        pytest.skip("native toolchain unavailable")
    return native_audio


class TestNativeAudio:
    def test_decode_bit_exact(self, native, tmp_path, rng):
        x = (rng.normal(size=44100) * 0.2).clip(-1, 1)
        p = tmp_path / "x.wav"
        wavio.write_wav(p, x, 44100)
        ns, rate = native.decode(p)
        py = wavio.read_wav(p).to_mono()
        assert rate == 44100
        np.testing.assert_array_equal(ns, py.samples.astype(np.float32))

    def test_stereo_mixdown(self, native, tmp_path):
        st = np.stack([np.ones(500) * 0.5, np.zeros(500)], axis=1)
        p = tmp_path / "s.wav"
        wavio.write_wav(p, st, 8000)
        ns, rate = native.decode(p)
        assert abs(float(ns.mean()) - 0.25) < 1e-3

    def test_batch_load_padded(self, native, tmp_path, rng):
        paths = []
        for i, n in enumerate((1000, 2000, 1500)):
            p = tmp_path / f"b{i}.wav"
            wavio.write_wav(p, rng.normal(size=n) * 0.1, 16000)
            paths.append(p)
        batch, lens, rate = native.load_batch(paths, stride=4096)
        assert batch.shape == (3, 4096)
        assert list(lens) == [1000, 2000, 1500]
        assert rate == 16000
        assert batch[0, 1000:].max() == 0.0  # padded

    def test_batch_i16_bit_parity_with_float_loader(self, native, tmp_path, rng):
        # mono PCM16 at the target rate: the i16 fast path must be an exact
        # image of what the float loader decodes
        paths = []
        for i, n in enumerate((1000, 2000, 1500)):
            p = tmp_path / f"i{i}.wav"
            wavio.write_wav(p, (rng.normal(size=n) * 0.2).clip(-1, 1), 16000)
            paths.append(p)
        r16 = native.load_batch_i16(paths, stride=4096, target_rate=16000)
        assert r16 is not None
        b16, l16, rate = r16
        assert b16.dtype == np.int16 and rate == 16000 and list(l16) == [1000, 2000, 1500]
        bf, lf, _ = native.load_batch(paths, stride=4096, target_rate=16000)
        np.testing.assert_array_equal(b16.astype(np.float32) / 32768.0, bf)

    def test_batch_i16_declines_resample_and_stereo(self, native, tmp_path, rng):
        mono = tmp_path / "m.wav"
        wavio.write_wav(mono, rng.normal(size=800) * 0.1, 16000)
        # rate mismatch → needs resample → float path
        assert native.load_batch_i16([mono], stride=1024, target_rate=22050) is None
        st = tmp_path / "st.wav"
        wavio.write_wav(st, np.zeros((400, 2)), 16000)
        # stereo mixdown is not int16-exact → float path
        assert native.load_batch_i16([mono, st], stride=1024, target_rate=16000) is None

    def test_batch_i16_failure_row(self, native, tmp_path, rng):
        good = tmp_path / "g.wav"
        wavio.write_wav(good, rng.normal(size=600) * 0.1, 16000)
        bad = tmp_path / "bad.wav"
        bad.write_bytes(b"junk")
        res = native.load_batch_i16([good, bad], stride=1024, target_rate=16000)
        assert res is not None
        batch, lens, rate = res
        assert list(lens) == [600, 0] and batch[1].max() == 0

    def test_native_writer_bit_parity(self, native, tmp_path, rng):
        """The one-pass C++ PCM16 writer must produce byte-identical files
        to the numpy quantization (round half-to-even then clamp),
        including exact-half codes, out-of-range clips, and non-finite
        samples."""
        specials = np.array(
            [0.5 / 32768, 1.5 / 32768, -0.5 / 32768, 2.5 / 32768,  # exact halves
             1.0, -1.0, 1.5, -1.5, np.inf, -np.inf, np.nan, 0.0,
             32766.5 / 32768, -32767.5 / 32768, 0.999999, -0.999999],
            np.float32,
        )
        x = np.concatenate([specials, (rng.normal(size=30000) * 0.4).astype(np.float32)])
        p_nat = tmp_path / "nat.wav"
        assert native.write_wav_f32(p_nat, x, 22050, 1)
        pcm = np.clip(np.round(np.where(np.isnan(x), 0.0, x) * 32768.0), -32768, 32767).astype("<i2")
        import struct

        data = pcm.tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 22050, 22050 * 2, 2, 16)
        hdr += b"data" + struct.pack("<I", len(data))
        assert p_nat.read_bytes() == hdr + data

    def test_write_wav_native_dispatch_roundtrip(self, native, tmp_path, rng):
        # f32 input goes through the native writer inside wavio.write_wav;
        # the decoded samples must round-trip exactly (int16 grid)
        x = (rng.normal(size=5000) * 0.3).clip(-1, 1).astype(np.float32)
        p = tmp_path / "w.wav"
        wavio.write_wav(p, x, 16000)
        back = wavio.read_wav(p).to_mono()
        assert back.rate == 16000
        q = np.clip(np.round(x * 32768.0), -32768, 32767) / 32768.0
        np.testing.assert_array_equal(np.asarray(back.samples, np.float32), q.astype(np.float32))

    def test_batch_failure_row(self, native, tmp_path):
        bad = tmp_path / "bad.wav"
        bad.write_bytes(b"junk")
        batch, lens, rate = native.load_batch([bad], stride=64)
        assert lens[0] == 0 and batch[0].max() == 0.0

    def test_resample_tone(self, native, tmp_path):
        sr = 44100
        t = np.arange(sr) / sr
        x = 0.5 * np.sin(2 * np.pi * 440 * t)
        p = tmp_path / "t.wav"
        wavio.write_wav(p, x, sr)
        batch, lens, rate = native.load_batch([p], stride=20000, target_rate=16000)
        assert rate == 16000 and abs(int(lens[0]) - 16000) <= 2
        y = batch[0, : int(lens[0])]
        # 440 Hz survives: zero-crossing count ≈ 880
        zc = int(((y[:-1] < 0) & (y[1:] >= 0)).sum())
        assert abs(zc - 440) < 10

    def test_window_rms_matches_ops(self, native):
        from prosody_control_french_tts_tpu.ops.energy import _window_rms_sq

        # local generator: the shared session rng makes this data depend on
        # test order, and the float32-vs-float64 prefix-sum comparison is
        # tolerance-sensitive
        x = (np.random.default_rng(42).normal(size=22050) * 0.1).astype(np.float32)
        wr = native.window_rms(x, 22050, 100)
        ours = np.floor(np.sqrt(np.asarray(_window_rms_sq(jnp.asarray(x), 22050, 100))) * 32768)
        assert wr.shape == ours.shape
        assert np.abs(wr - ours).max() <= 1.0  # float64 vs float32 prefix sums


class TestPallasFrames:
    def test_interpret_matches_gather(self, rng):
        from prosody_control_french_tts_tpu.ops.pallas_kernels import (
            extract_frames,
            extract_frames_reference,
        )

        T, W, F = 8192, 256, 37
        x = jnp.asarray(rng.normal(size=T).astype(np.float32))
        starts = jnp.asarray(rng.integers(0, T - W, size=F).astype(np.int32))
        win = jnp.asarray((0.5 - 0.5 * np.cos(2 * np.pi * np.arange(W) / W)).astype(np.float32))
        ref = extract_frames_reference(x, starts, win, W)
        out = extract_frames(x, starts, win, W, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


class TestPallasFramesAligned:
    def test_interpret_matches_gather_exactly(self, rng):
        """The Mosaic-compatible variant (ALIGN-aligned DMA + bit-decomposed
        static rolls) must be bit-identical to the gather path — the rotate
        ladder only permutes lanes, it never rounds."""
        from prosody_control_french_tts_tpu.ops.pallas_kernels import (
            extract_frames_aligned,
            extract_frames_reference,
        )

        T, W, F = 50000, 880, 37  # production window width (44.1 kHz pitch)
        x = jnp.asarray(rng.normal(size=T).astype(np.float32))
        win = jnp.asarray((0.5 - 0.5 * np.cos(2 * np.pi * np.arange(W) / W)).astype(np.float32))
        # adversarial starts: alignment boundaries, boundary±1, full-range
        edges = np.array([0, 1, 1023, 1024, 1025, 2047, 2048, T - W], np.int32)
        starts = np.concatenate([edges, rng.integers(0, T - W, size=F - edges.size)])
        starts = jnp.asarray(starts.astype(np.int32))
        ref = extract_frames_reference(x, starts, win, W)
        out = extract_frames_aligned(x, starts, win, W, interpret=True)
        assert np.array_equal(np.asarray(out), np.asarray(ref))

    def test_frames_op_dispatch_matches_gather(self, rng):
        """frames_op (the production dispatcher: compiled Pallas kernel on
        TPU, gather elsewhere) must be bit-identical to the gather on the
        active backend — under PCFT_TEST_TPU=1 this runs the REAL Mosaic
        kernel on hardware, including under vmap."""
        import jax

        from prosody_control_french_tts_tpu.ops.pallas_kernels import (
            extract_frames_reference,
            frames_op,
        )

        T, W, F = 50000, 880, 64
        x = rng.normal(size=(2, T)).astype(np.float32)
        starts = rng.integers(0, T - W, size=(2, F)).astype(np.int32)
        win = jnp.asarray((0.5 - 0.5 * np.cos(2 * np.pi * np.arange(W) / W)).astype(np.float32))
        out = jax.vmap(lambda xx, ss: frames_op(xx, ss, win, W))(
            jnp.asarray(x), jnp.asarray(starts)
        )
        ref = jax.vmap(lambda xx, ss: extract_frames_reference(xx, ss, win, W))(
            jnp.asarray(x), jnp.asarray(starts)
        )
        assert np.array_equal(np.asarray(out), np.asarray(ref))


def _xla_candidates(r, k, min_lag, max_lag, vth):
    """The ops.pitch XLA candidate stage (local maxima → top-k →
    parabolic), masked to zeros on invalid slots — the oracle for the
    Pallas kernel."""
    from prosody_control_french_tts_tpu.ops.pitch import _top_k

    L = r.shape[-1]
    lag_idx = jnp.arange(L)
    interior = (lag_idx >= min_lag) & (lag_idx < max_lag)
    r_m1 = jnp.concatenate([r[:, :1], r[:, :-1]], axis=-1)
    r_p1 = jnp.concatenate([r[:, 1:], r[:, -1:]], axis=-1)
    is_max = (r > r_m1) & (r >= r_p1) & (r > 0.5 * vth) & interior[None, :]
    score = jnp.where(is_max, r, -jnp.inf)
    top_val, top_lag = _top_k(score, k)
    valid = jnp.isfinite(top_val)
    safe_lag = jnp.clip(top_lag, 1, L - 2)
    rv = jnp.take_along_axis(r, safe_lag, axis=-1)
    rl = jnp.take_along_axis(r, safe_lag - 1, axis=-1)
    rr_ = jnp.take_along_axis(r, safe_lag + 1, axis=-1)
    dr = 0.5 * (rr_ - rl)
    d2r = 2.0 * rv - rl - rr_
    offset = jnp.where(jnp.abs(d2r) > 1e-12, dr / d2r, 0.0)
    lag_f = safe_lag.astype(jnp.float32) + jnp.clip(offset, -1.0, 1.0)
    strength = rv + 0.5 * dr * offset
    return (
        jnp.where(valid, lag_f, 0.0),
        jnp.where(valid, strength, 0.0),
        valid,
    )


def _candidate_fixtures(rng):
    """Adversarial r batches: oscillatory rows (many maxima > k), flat rows
    (no maxima), sparse rows (< k maxima), and exact value ties."""
    F, L = 96, 297
    t = np.arange(L, dtype=np.float32)
    rows = []
    for i in range(F):
        kind = i % 4
        if kind == 0:  # many maxima: fast oscillation
            rows.append(0.8 * np.cos(2 * np.pi * t / (6 + i % 5)) + 0.1)
        elif kind == 1:  # none above threshold
            rows.append(np.full(L, 0.01, np.float32))
        elif kind == 2:  # a few isolated peaks
            row = np.zeros(L, np.float32)
            for pk in (80, 140, 230):
                row[pk] = 0.9 - 0.1 * (pk / 100.0)
                row[pk - 1] = row[pk + 1] = 0.3
            rows.append(row)
        else:  # exact ties: quantized random
            rows.append(np.round(rng.normal(size=L).astype(np.float32), 1) * 0.5)
    return jnp.asarray(np.stack(rows).astype(np.float32))


class TestPallasCandidates:
    K, MIN_LAG, MAX_LAG, VTH = 14, 72, 295, 0.45

    def test_interpret_matches_xla_stage(self, rng):
        """Interpreter-mode kernel vs the XLA candidate stage on adversarial
        rows (many/no/few maxima, exact ties): identical selections, lags,
        strengths, and valid masks."""
        from prosody_control_french_tts_tpu.ops.pallas_kernels import topk_parabolic

        r = _candidate_fixtures(rng)
        lag_k, str_k, val_k = topk_parabolic(
            r, self.K, self.MIN_LAG, self.MAX_LAG, self.VTH, interpret=True
        )
        lag_x, str_x, val_x = _xla_candidates(r, self.K, self.MIN_LAG, self.MAX_LAG, self.VTH)
        np.testing.assert_array_equal(np.asarray(val_k), np.asarray(val_x))
        np.testing.assert_allclose(np.asarray(lag_k), np.asarray(lag_x), rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(str_k), np.asarray(str_x), rtol=1e-6, atol=1e-6)

    def test_dispatch_matches_xla_stage(self, rng):
        """The compiled kernel on the active backend (real Mosaic under
        PCFT_TEST_TPU=1) vs the XLA stage — the production parity check."""
        import os

        from prosody_control_french_tts_tpu.ops.pallas_kernels import topk_parabolic

        interpret = not os.environ.get("PCFT_TEST_TPU")
        r = _candidate_fixtures(rng)
        lag_k, str_k, val_k = topk_parabolic(
            r, self.K, self.MIN_LAG, self.MAX_LAG, self.VTH, interpret=interpret
        )
        lag_x, str_x, val_x = _xla_candidates(r, self.K, self.MIN_LAG, self.MAX_LAG, self.VTH)
        np.testing.assert_array_equal(np.asarray(val_k), np.asarray(val_x))
        np.testing.assert_allclose(np.asarray(lag_k), np.asarray(lag_x), rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(str_k), np.asarray(str_x), rtol=1e-5, atol=1e-6)

    def test_pitch_track_parity_on_speech(self, corpus_wavs):
        """Full praat_pitch on real speech must be unchanged by the kernel
        dispatch: under PCFT_TEST_TPU=1 the TPU track (Pallas candidates)
        is compared against the force-XLA candidate path on the same
        backend; on CPU this degenerates to a self-consistency check."""
        from prosody_control_french_tts_tpu.ops.pitch import PitchParams, praat_pitch
        from prosody_control_french_tts_tpu.utils.wavio import read_wav

        a = read_wav(corpus_wavs[0]).to_mono()
        x = np.asarray(a.samples, np.float32)[: 3 * a.rate]
        f0_prod = np.asarray(praat_pitch(x, a.rate).f0)
        # sinc_refine_steps>0 forces the XLA candidate branch (the kernel
        # only serves the parabolic path); steps=0 vs steps=0-with-kernel
        # differ only in the candidate stage implementation
        f0_xla = np.asarray(praat_pitch(x, a.rate, PitchParams(sinc_refine_steps=1)).f0)
        voiced = (f0_prod > 0) & (f0_xla > 0)
        assert (f0_prod > 0).mean() > 0.1
        # sinc refinement moves peaks ≤4e-4 relative (tests/test_ops_dsp);
        # candidate *selection* must agree almost everywhere
        assert ((f0_prod > 0) == (f0_xla > 0)).mean() > 0.99
        rel = np.abs(f0_prod[voiced] - f0_xla[voiced]) / f0_xla[voiced]
        assert np.median(rel) < 1e-3


class TestPallasCumsum:
    def test_interpret_matches_numpy(self, rng):
        from prosody_control_french_tts_tpu.ops.pallas_kernels import CUMSUM_CHUNK, chunk_cumsum

        x = np.random.default_rng(3).normal(size=(16, 4 * CUMSUM_CHUNK)).astype(np.float32)
        got = np.asarray(chunk_cumsum(jnp.asarray(x), interpret=True))
        xr = x.reshape(16, 4, CUMSUM_CHUNK)
        ref = (np.cumsum(xr, axis=-1) - xr).reshape(16, 4 * CUMSUM_CHUNK)
        np.testing.assert_allclose(got, ref, atol=2e-3)
