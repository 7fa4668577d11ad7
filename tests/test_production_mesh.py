"""Production data-mesh use (VERDICT round-2 weak #3 / next-round #5).

The PRODUCTION measure path (core.pipeline → prosody.measure dispatchers)
must shard its corpus batch over the device mesh when more than one device
participates — and produce the same numbers as the single-device path.
These tests opt in via ``PCFT_DATA_MESH`` on the conftest's 8-device
virtual CPU mesh (on real multi-chip accelerators the mesh activates
automatically — parallel.mesh.production_data_mesh).
"""

import csv

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from prosody_control_french_tts_tpu.core.pipeline import AudioPipeline
from prosody_control_french_tts_tpu.ops.pitch import PitchParams
from prosody_control_french_tts_tpu.prosody.measure import (
    _corpus_to_device,
    _measure_device,
)
from prosody_control_french_tts_tpu.tts.fake import FakeBackend


def _synth_batch():
    rng = np.random.default_rng(0)
    sr = 22050
    S, T, N = 3, 1 << 14, 4
    t = np.arange(T) / sr
    nat = np.stack(
        [
            (0.4 * np.sin(2 * np.pi * f * t) * (rng.random(T) < 0.97)).astype(np.float32)
            for f in (180.0, 220.0, 260.0)
        ]
    )
    lens = np.array([T, T - 1500, T - 3000], np.int32)
    for i, l in enumerate(lens):
        nat[i, l:] = 0
    win = np.zeros((S, N, 2), np.int32)
    mask = np.zeros((S, N), bool)
    for i in range(S):
        step = int(lens[i]) // N
        for j in range(N):
            win[i, j] = (j * step, (j + 1) * step)
            mask[i, j] = True
    return sr, (nat, lens, nat, lens, win, win, mask)


class TestCorpusToDevice:
    def test_single_device_passthrough(self, monkeypatch):
        monkeypatch.setenv("PCFT_DATA_MESH", "0")
        _, args = _synth_batch()
        dev = _corpus_to_device(list(args))
        assert dev[0].shape == args[0].shape  # no padding

    def test_sharded_pads_and_places(self, monkeypatch):
        monkeypatch.setenv("PCFT_DATA_MESH", "8")
        _, args = _synth_batch()
        dev = _corpus_to_device(list(args))
        assert dev[0].shape[0] == 8  # S=3 → padded to the data-axis size
        assert len(dev[0].sharding.device_set) == 8

    def test_measure_parity_sharded_vs_single(self, monkeypatch):
        sr, args = _synth_batch()
        S, T = args[0].shape
        pp = PitchParams()

        monkeypatch.setenv("PCFT_DATA_MESH", "0")
        single = _measure_device(
            *_corpus_to_device(list(args)), rate=float(sr), T=T, T2=T, pp=pp
        )
        single = [np.asarray(o)[:S] for o in single]

        monkeypatch.setenv("PCFT_DATA_MESH", "8")
        sharded = _measure_device(
            *_corpus_to_device(list(args)), rate=float(sr), T=T, T2=T, pp=pp
        )
        sharded = [np.asarray(o)[:S] for o in sharded]
        for a, b in zip(single, sharded):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


class TestPipelineMeasureSharded:
    def test_measure_step_identical_on_mesh(self, tmp_path, monkeypatch):
        """The pipeline's Measure & Build SSML step writes byte-identical
        CSVs whether the corpus batch is sharded over the 8-device mesh or
        kept on one device."""
        from prosody_control_french_tts_tpu.core.config import PipelineConfig
        from prosody_control_french_tts_tpu.utils import wavio
        from prosody_control_french_tts_tpu.utils.textgridio import (
            word_tier_with_silences,
            write_textgrid,
        )

        SR = 44100
        segments = {
            "segment_ph1": [("bonjour", 0), ("le", 0), ("monde.", 400), ("merci", 0)],
            "segment_ph2": [("la", 0), ("voix", 300), ("change.", 0)],
        }
        csvs = {}
        for tag, mesh_env in (("single", "0"), ("mesh", "8")):
            monkeypatch.setenv("PCFT_DATA_MESH", mesh_env)
            base = tmp_path / tag
            name = "v"
            vdir = base / "Data" / "voice" / name
            (vdir / "audio").mkdir(parents=True)
            (vdir / "transcription_raw").mkdir(parents=True)
            tg_dir = vdir / "WhisperTS_textgrid_files"
            tg_dir.mkdir(parents=True)
            gen = FakeBackend(seed=7)
            for seg, wp in segments.items():
                chunks, times, cursor = [], [], 0.0
                for word, pause_ms in wp:
                    a = gen._voice(word, pitch_pct=5.0, rate_pct=0.0, volume_pct=0.0)
                    times.append((cursor, cursor + len(a) / SR, word))
                    cursor += len(a) / SR
                    chunks.append(a)
                    if pause_ms:
                        chunks.append(np.zeros(int(pause_ms * SR / 1000)))
                        cursor += pause_ms / 1000.0
                x = np.concatenate(chunks)
                wavio.write_wav(vdir / "audio" / f"{seg}.wav", x, SR)
                write_textgrid(
                    word_tier_with_silences(times, total_duration=len(x) / SR),
                    tg_dir / f"{seg}.TextGrid",
                )
                (vdir / "transcription_raw" / f"{seg}.txt").write_text(
                    " ".join(w for w, _ in wp), encoding="utf-8"
                )
            cfg = PipelineConfig.from_dict(
                {
                    "data_dir": "Data/voice",
                    "out_dir": "Out",
                    "voice_names": [name],
                    "tts_backend": "fake",
                    "aligner": "precomputed",
                },
                base,
            )
            pipe = AudioPipeline(name, cfg, tts=FakeBackend(seed=1))
            pipe.raw_synthesis()
            pipe.measure_prosody_and_build_ssml()
            csvs[tag] = (base / "Out" / "results" / name / "BDD_ssml.csv").read_bytes()
        assert csvs["single"] == csvs["mesh"]


class TestPackedGroupDispatch:
    def _fake_prep(self, nat, lens, win, mask, sr):
        from prosody_control_french_tts_tpu.prosody.measure import PreparedVoice

        S = nat.shape[0]
        return PreparedVoice(
            names=[f"seg{i}" for i in range(S)],
            raw_seqs=[[] for _ in range(S)],
            synts_per_seg=[[] for _ in range(S)],
            nat=nat,
            nat_len=lens,
            rate=sr,
            raw_ok=np.ones(S, bool),
            raw_len=lens,
            raw_for_device=nat,
            raw_len_dev=lens,
            win_nat=win,
            win_raw=win,
            win_raw_dev=win,
            mask=mask,
            raw_slice_empty=np.zeros_like(mask),
        )

    @pytest.mark.parametrize("mesh_env", ["0", "8"])
    def test_packed_matches_per_voice(self, monkeypatch, mesh_env):
        """Multi-voice packed dispatch returns each voice's own rows —
        including under mesh padding, where each voice's device image is
        padded to the data-axis multiple and the pack must slice the pad
        rows away before concatenating."""
        from prosody_control_french_tts_tpu.prosody.measure import (
            _dispatch_group,
            run_measure_device,
        )

        monkeypatch.setenv("PCFT_DATA_MESH", mesh_env)
        sr, (nat, lens, _, _, win, _, mask) = _synth_batch()
        pp = PitchParams()
        # two voices with different row counts (3 and 2)
        prep_a = self._fake_prep(nat, lens, win, mask, sr)
        prep_b = self._fake_prep(nat[:2] * np.float32(0.8), lens[:2], win[:2], mask[:2], sr)
        from prosody_control_french_tts_tpu.prosody.measure import _unpack6

        items, lazy = _dispatch_group([("a", prep_a), ("b", prep_b)], pp)
        packed = list(_unpack6(np.asarray(lazy)))
        offset = 0
        for name, prep in items:
            S = prep.nat.shape[0]
            solo = run_measure_device(prep, pp)
            for k in range(6):
                got = packed[k][offset : offset + S]
                if got.ndim == 2:  # syntagme axis may pad wider in the group
                    got = got[:, : solo[k].shape[1]]
                np.testing.assert_allclose(got, solo[k], rtol=2e-4, atol=2e-4)
            offset += S
