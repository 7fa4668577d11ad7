"""Experiment drivers end-to-end on a tiny synthetic bdd.json."""

import json

import numpy as np
import pytest

from tests.test_harnesses import make_bdd


@pytest.fixture(scope="module")
def bdd_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("bdd") / "bdd.json"
    p.write_text(json.dumps(make_bdd(n_segments=4, words_per=6)), encoding="utf-8")
    return p


class TestExperimentDrivers:
    def test_break_experiment(self, bdd_file, tmp_path):
        from prosody_control_french_tts_tpu.models.experiment import run_break_experiment

        rep = run_break_experiment(bdd_file, tmp_path, runs=2, epochs=2, tiny=True)
        assert "f1" in rep and rep["sentences_per_second"] > 0
        assert (tmp_path / "break_report.json").exists()
        assert (tmp_path / "break_tagger.npz").exists()
        assert (tmp_path / "tokenizer.json").exists()

    def test_fewshot_experiment_with_stub(self, bdd_file, tmp_path):
        from prosody_control_french_tts_tpu.models.experiment import run_fewshot_experiment
        from prosody_control_french_tts_tpu.models.fewshot import ExperimentConfig, StubLLM

        cfg = ExperimentConfig(models=["stub"], num_samples=12, num_few_shot_examples=2, mode="fewshot")
        res = run_fewshot_experiment(
            bdd_file, tmp_path, config=cfg, clients={"stub": StubLLM(noise=0.5)}
        )
        assert "stub" in res
        assert (tmp_path / "result_stub.json").exists()
        assert (tmp_path / "comparison.html").exists()

    def test_cascade_experiment(self, bdd_file, tmp_path):
        from prosody_control_french_tts_tpu.models.experiment import run_cascade_experiment

        rep = run_cascade_experiment(bdd_file, tmp_path, epochs=2, tiny=True)
        assert "stage_a" in rep
        assert 0.0 <= rep["stage_a"]["break_f1"] <= 1.0
        assert (tmp_path / "cascade_report.json").exists()


class TestEvaluateVoice:
    def test_evaluate_all_on_pipeline_output(self, tmp_path):
        """Run the hermetic pipeline then the objective evaluation driver."""
        from prosody_control_french_tts_tpu.core.config import PipelineConfig
        from prosody_control_french_tts_tpu.core.pipeline import AudioPipeline
        from prosody_control_french_tts_tpu.eval.evaluate_voice import evaluate_all
        from prosody_control_french_tts_tpu.tts.fake import FakeBackend
        from prosody_control_french_tts_tpu.utils import wavio
        from prosody_control_french_tts_tpu.utils.textgridio import word_tier_with_silences, write_textgrid

        SR = 44100
        name = "ev"
        vdir = tmp_path / "Data" / "voice" / name
        (vdir / "audio").mkdir(parents=True)
        (vdir / "transcription_raw").mkdir(parents=True)
        (vdir / "transcription").mkdir(parents=True)
        tgd = vdir / "WhisperTS_textgrid_files"
        tgd.mkdir()
        gen = FakeBackend(seed=5)
        words = ["bonjour", "le", "monde", "merci."]
        chunks, times, t = [], [], 0.0
        for w in words:
            a = gen._voice(w, 3.0, 0.0, 0.0)
            times.append((t, t + len(a) / SR, w))
            t += len(a) / SR
            chunks.append(a)
        x = np.concatenate(chunks)
        wavio.write_wav(vdir / "audio" / "segment_ph1.wav", x, SR)
        write_textgrid(word_tier_with_silences(times, len(x) / SR), tgd / "segment_ph1.TextGrid")
        (vdir / "transcription_raw" / "segment_ph1.txt").write_text(" ".join(words))
        (vdir / "transcription" / "segment_ph1.txt").write_text(" ".join(words))

        cfg = PipelineConfig.from_dict(
            {"data_dir": "Data/voice", "out_dir": "Out", "voice_names": [name],
             "tts_backend": "fake", "aligner": "precomputed"},
            tmp_path,
        )
        pipe = AudioPipeline(name, cfg, tts=FakeBackend(seed=7))
        for step in (pipe.raw_synthesis, pipe.measure_prosody_and_build_ssml,
                     pipe.synthesize_and_merge, pipe.final_transcribe, pipe.compare_breaks):
            step()
        summary = evaluate_all(tmp_path / "Out", tmp_path / "Data" / "voice",
                               tmp_path / "Out" / "evaluation.json")
        rep = summary["voices"][name]
        assert "f0_rmse_log2" in rep and rep["f0_rmse_log2"] >= 0
        assert "break" in rep
        assert "wer" in rep
        assert (tmp_path / "Out" / "evaluation.json").exists()
