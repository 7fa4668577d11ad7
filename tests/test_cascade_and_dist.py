"""Cascade training harness, sharded measure, checkpointing, CLI, convert."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prosody_control_french_tts_tpu.models.cascade import (
    TASK_A,
    build_batches,
    format_example,
    generate,
    train_stage,
)
from prosody_control_french_tts_tpu.models.llm import LLMConfig
from prosody_control_french_tts_tpu.models.tokenizer import WordPieceTokenizer

PAIRS = [
    {"x": "bonjour le monde merci", "y": "bonjour le monde <break/> merci"},
    {"x": "la voix parle bien", "y": "la voix parle <break/> bien"},
    {"x": "un deux trois quatre", "y": "un deux <break/> trois quatre"},
    {"x": "le chat dort ici", "y": "le chat dort <break/> ici"},
]


@pytest.fixture(scope="module")
def tok():
    texts = [p["y"] for p in PAIRS] + ["### Task: ### Text: ### SSML:", TASK_A]
    return WordPieceTokenizer.train(texts, vocab_size=300, min_freq=1)


class TestCascade:
    def test_batch_masking(self, tok):
        b = build_batches(PAIRS[:2], tok, TASK_A, max_len=128)
        # loss mask covers only completion tokens
        for i in range(2):
            prompt_len = len(tok.encode(format_example(TASK_A, PAIRS[i]["x"], None))) - 1
            assert b.loss_mask[i, : prompt_len].sum() == 0
            assert b.loss_mask[i, prompt_len:].sum() > 0

    def test_training_reduces_loss_and_generates(self, tok):
        cfg = LLMConfig(vocab_size=len(tok), dim=64, layers=2, heads=4, kv_heads=2, ffn=128, max_len=128, lora_rank=4)
        model, params, losses = train_stage(PAIRS, tok, cfg=cfg, epochs=12, batch_size=2, lr=5e-3)
        assert losses[-1] < losses[0] * 0.8
        out = generate(model, params, tok, TASK_A, PAIRS[0]["x"], max_new=24)
        assert isinstance(out, str)


class TestShardedMeasure:
    def test_matches_single_device(self):
        from prosody_control_french_tts_tpu.parallel.measure_sharded import measure_sharded
        from prosody_control_french_tts_tpu.parallel.mesh import make_mesh
        from prosody_control_french_tts_tpu.prosody.measure import _measure_device
        from prosody_control_french_tts_tpu.ops.pitch import PitchParams

        rng = np.random.default_rng(0)
        sr = 22050
        S, T, N = 3, 1 << 15, 4
        t = np.arange(T) / sr
        nat = np.stack([
            (0.4 * np.sin(2 * np.pi * f * t) * (rng.random(T) < 0.97)).astype(np.float32)
            for f in (180.0, 220.0, 260.0)
        ])
        lens = np.array([T, T - 2000, T - 4000], np.int32)
        for i, l in enumerate(lens):
            nat[i, l:] = 0
        win = np.zeros((S, N, 2), np.int32)
        mask = np.zeros((S, N), bool)
        for i in range(S):
            step = int(lens[i]) // N
            for j in range(N):
                win[i, j] = (j * step, (j + 1) * step)
                mask[i, j] = True

        single = _measure_device(
            jnp.asarray(nat), jnp.asarray(lens), jnp.asarray(nat), jnp.asarray(lens),
            jnp.asarray(win), jnp.asarray(win), jnp.asarray(mask),
            rate=float(sr), T=T, T2=T, pp=PitchParams(),
        )
        mesh = make_mesh(data=4, model=2)
        sharded = measure_sharded(
            mesh, nat, lens, nat, lens, win, win, mask, rate=sr
        )
        for a, b in zip(single, sharded):
            np.testing.assert_allclose(np.asarray(a), b, rtol=2e-4, atol=2e-4)


class TestCheckpoint:
    def test_orbax_roundtrip(self, tmp_path):
        from prosody_control_french_tts_tpu.core.checkpoint import (
            latest_checkpoint,
            restore_train_state,
            save_train_state,
        )

        state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.int32(7)}
        save_train_state(tmp_path, 1, state)
        save_train_state(tmp_path, 2, state)
        save_train_state(tmp_path, 3, state, keep=2)
        assert latest_checkpoint(tmp_path).name == "step_00000003"
        assert not (tmp_path / "step_00000001").exists()  # retention
        restored, step = restore_train_state(tmp_path, state)
        assert step == 3
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), np.arange(4.0))

    def test_step_markers(self, tmp_path):
        from prosody_control_french_tts_tpu.core.checkpoint import StepMarkers

        m = StepMarkers(tmp_path)
        assert not m.done("align")
        m.mark("align")
        assert m.done("align")
        m.clear()
        assert not m.done("align")


class TestProfiling:
    def test_step_timer(self, tmp_path):
        from prosody_control_french_tts_tpu.core.profiling import StepTimer

        t = StepTimer()
        with t.step("a", voice="v1"):
            pass
        with pytest.raises(ValueError):
            with t.step("b"):
                raise ValueError("boom")
        t.dump(tmp_path / "t.jsonl")
        lines = [json.loads(l) for l in (tmp_path / "t.jsonl").read_text().splitlines()]
        assert lines[0]["step"] == "a" and lines[0]["voice"] == "v1"
        assert lines[1]["error"] is not None


class TestCLI:
    def test_analyze_command(self, tmp_path, capsys):
        from prosody_control_french_tts_tpu.__main__ import main
        from prosody_control_french_tts_tpu.utils import wavio

        wavio.write_wav(tmp_path / "v__segment_ph1.wav", np.zeros(8000), 8000)
        (tmp_path / "v__segment_ph1.txt").write_text("bonjour le monde.")
        rc = main(["analyze", str(tmp_path)])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["files"] == 1

    def test_unknown_command(self, capsys):
        from prosody_control_french_tts_tpu.__main__ import main

        assert main(["nope"]) == 1


class TestConvert:
    def test_wav_passthrough(self, tmp_path):
        from prosody_control_french_tts_tpu.audio.convert import convert_to_wav
        from prosody_control_french_tts_tpu.utils import wavio

        src = tmp_path / "a.wav"
        wavio.write_wav(src, np.zeros(100), 8000)
        dst = convert_to_wav(src, tmp_path / "out" / "a.wav")
        assert dst.exists()

    def test_mp3_without_ffmpeg(self, tmp_path, monkeypatch):
        from prosody_control_french_tts_tpu.audio import convert

        monkeypatch.setattr(convert, "ffmpeg_available", lambda: False)
        (tmp_path / "x.mp3").write_bytes(b"\xff\xfb")
        with pytest.raises(RuntimeError, match="ffmpeg"):
            convert.convert_to_wav(tmp_path / "x.mp3", tmp_path / "x.wav")


class TestDistributed:
    def test_hybrid_mesh_single_slice(self):
        from prosody_control_french_tts_tpu.parallel.distributed import (
            hybrid_mesh,
            host_local_batch_slice,
            initialize,
        )

        assert initialize() is False  # single-process: no-op
        mesh = hybrid_mesh(model=2)
        assert mesh.axis_names == ("dcn", "data", "model")
        assert mesh.shape["model"] == 2
        assert mesh.shape["dcn"] * mesh.shape["data"] * mesh.shape["model"] == 8
        sl = host_local_batch_slice(16)
        assert sl == slice(0, 16)

    def test_train_step_on_hybrid_mesh(self):
        """The LoRA train step runs with batch sharded over (dcn, data)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from prosody_control_french_tts_tpu.models.llm import LLMConfig
        from prosody_control_french_tts_tpu.models.training import init_train, make_train_step
        from prosody_control_french_tts_tpu.parallel.distributed import hybrid_mesh
        from prosody_control_french_tts_tpu.parallel.sharding import llm_param_spec

        mesh = hybrid_mesh(model=2)
        cfg = LLMConfig(vocab_size=128, dim=32, layers=1, heads=4, kv_heads=2, ffn=64, max_len=32, lora_rank=2)
        model, tx, state = init_train(cfg, lr=1e-3)
        step = make_train_step(model, tx, donate=False, trainable=state.mask)
        pspec = llm_param_spec(state.params)
        params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state.params, pspec
        )
        opt = jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())) if hasattr(x, "shape") else x,
            state.opt_state,
        )
        ids = jnp.asarray(np.random.default_rng(0).integers(1, 128, (8, 16)), jnp.int32)
        lm = jnp.ones((8, 16), jnp.float32)
        batch_sh = NamedSharding(mesh, P(("dcn", "data")))
        with mesh:
            p2, o2, loss = step(params, opt, jax.device_put(ids, batch_sh), jax.device_put(lm, batch_sh))
        assert np.isfinite(float(loss))
