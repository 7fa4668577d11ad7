"""Out-of-the-box CTC aligner (VERDICT round-1 item 9).

The packaged checkpoint (align/pretrained/ctc_fr_synth.npz, built by
``python -m prosody_control_french_tts_tpu pretrain-ctc``) must make
``aligner: ctc`` work on a fresh clone with zero configuration: construct
→ align → TextGrids, with held-out word-boundary error under the gold
harness threshold — the role MFA/NeMo pretrained acoustic models play for
the reference (Code/Aligners/Use_MFA.py:50-53).
"""

from __future__ import annotations

import numpy as np
import pytest

from prosody_control_french_tts_tpu.align.ctc_aligner import CTCAligner
from prosody_control_french_tts_tpu.align.pretrain_ctc import PACKAGED_WEIGHTS, boundary_error_ms
from prosody_control_french_tts_tpu.align.synth_speech import SynthSpec, synth_sentence
from prosody_control_french_tts_tpu.utils.wavio import Audio


pytestmark = pytest.mark.skipif(
    not PACKAGED_WEIGHTS.exists(), reason="packaged CTC checkpoint not built"
)


@pytest.fixture(scope="module")
def aligner():
    al = CTCAligner()  # no weights_path, no params — must auto-load
    assert al.params is not None, "packaged checkpoint did not auto-load"
    return al


class TestPackagedCheckpoint:
    def test_heldout_sentences_boundary_error(self, aligner):
        # sentences sampled from the training vocabulary but never seen
        # (seed far outside the training range)
        from prosody_control_french_tts_tpu.align.synth_speech import sample_sentences

        err = boundary_error_ms(aligner, sample_sentences(6, seed=555_000), SynthSpec())
        assert err < 80.0, f"held-out boundary error {err:.1f} ms"

    def test_unseen_words_generalize(self, aligner):
        # words absent from the pretraining vocabulary — compositional
        # char-level generalization, not memorization
        sent = "ouragan perle zigzag mystère chocolat"
        audio, gold = synth_sentence(sent, seed=99)
        tg = aligner.align(Audio(audio, 16000), sent)
        words = [(iv.min_time, iv.max_time, iv.mark) for iv in tg.tiers[0] if iv.mark.strip()]
        assert [w for _, _, w in words] == sent.split()
        errs = [abs(g[0] - w[0]) + abs(g[1] - w[1]) for g, w in zip(gold, words)]
        assert float(np.mean(errs)) / 2 < 0.08, errs

    def test_snap_untouched_in_distribution(self, aligner):
        """auto mode must NOT move in-distribution boundaries: held-out
        synthetic error identical with and without the OOD speech-snap
        (VERDICT r4 #6 gate: 'synthetic boundary error unchanged')."""
        from prosody_control_french_tts_tpu.align.synth_speech import sample_sentences

        sents = sample_sentences(4, seed=555_000)

        class _Bias0:
            def align(self, a, t):
                return aligner.align(a, t, blank_bias=0.0)

        e_auto = boundary_error_ms(aligner, sents, SynthSpec())
        e_raw = boundary_error_ms(_Bias0(), sents, SynthSpec())
        assert abs(e_auto - e_raw) < 1.0, (e_auto, e_raw)

    def test_ood_speech_coverage_real_audio(self, aligner):
        """On REAL French (out of the synthetic training distribution) the
        Viterbi path parks speech on the space label; the speech-snap must
        lift word coverage of detected speech to >= 0.90 without putting
        word mass into silence (Code/Aligners/CTCFA.py:74 — a forced
        alignment spans the audio)."""
        from pathlib import Path

        from prosody_control_french_tts_tpu.utils.wavio import read_wav, resample

        wav = Path("/root/reference/Data/voice/records/audio/segment_ph2.wav")
        if not wav.exists():
            pytest.skip("bundled real corpus unavailable")
        txt = "bonjour et bienvenue dans cette nouvelle emission consacree a la musique"
        ar = read_wav(wav).to_mono()
        a16 = resample(ar, 16000)
        speech = aligner._speech_mask(a16)
        tg = aligner.align(ar, txt)
        tr = [(iv.min_time, iv.max_time, iv.mark) for iv in tg.tiers[0] if iv.mark.strip()]
        cov = aligner._speech_coverage(speech, tr)
        assert cov >= 0.90, cov
        wm = np.zeros_like(speech)
        for t0, t1, _ in tr:
            wm[int(t0 * 1000) : int(t1 * 1000)] = True
        in_silence = float((wm & ~speech).sum() / max(wm.sum(), 1))
        assert in_silence < 0.05, in_silence
        # words stay ordered and non-overlapping after the snap
        for (a0, a1, _), (b0, b1, _) in zip(tr, tr[1:]):
            assert a1 <= b0 + 1e-6

    def test_greedy_transcription_sanity(self, aligner):
        # the checkpoint is frame-supervised for LOCALIZATION (boundary
        # frames emit stray chars under greedy collapse), so transcription
        # is only sanity-checked: the right characters in the right order,
        # CER bounded — forced alignment, the aligner contract, is the
        # precise path (boundary tests above)
        audio, _ = synth_sentence("bonjour le monde", seed=3)
        hyp = aligner.transcribe(Audio(audio, 16000))
        from prosody_control_french_tts_tpu.eval.metrics import wer

        cer = wer(" ".join("bonjour le monde"), " ".join(hyp))
        assert cer < 0.7, (cer, hyp)
        assert "le" in hyp and "mond" in hyp.replace(" ", ""), hyp


class TestPipelineZeroConfig:
    def test_aligner_ctc_without_weights(self, tmp_path):
        """Fresh-clone contract: `aligner: ctc` with NO aligner_options
        produces word TextGrids through the pipeline's align step."""
        from prosody_control_french_tts_tpu.core.config import PipelineConfig
        from prosody_control_french_tts_tpu.core.pipeline import AudioPipeline
        from prosody_control_french_tts_tpu.tts.fake import FakeBackend
        from prosody_control_french_tts_tpu.utils import wavio
        from prosody_control_french_tts_tpu.utils.textgridio import read_textgrid

        sent = "la musique commence demain matin"
        audio, _ = synth_sentence(sent, seed=7)
        vdir = tmp_path / "Data" / "voice" / "cv"
        (vdir / "audio").mkdir(parents=True)
        (vdir / "transcription_raw").mkdir(parents=True)
        wavio.write_wav(vdir / "audio" / "segment_ph1.wav", audio, 16000)
        (vdir / "transcription_raw" / "segment_ph1.txt").write_text(sent, encoding="utf-8")
        cfg = PipelineConfig.from_dict(
            {
                "data_dir": "Data/voice",
                "out_dir": "Out",
                "voice_names": ["cv"],
                "tts_backend": "fake",
                "aligner": "ctc",
            },
            tmp_path,
        )
        pipe = AudioPipeline("cv", cfg, tts=FakeBackend(seed=1))
        pipe.align_and_transcribe()
        tg = read_textgrid(vdir / "WhisperTS_textgrid_files" / "segment_ph1.TextGrid")
        words = [iv.mark for iv in tg.tiers[0] if iv.mark.strip()]
        assert words == sent.split()
