"""Prosody-prediction models (flax/jit/pjit) — the TPU-native equivalents
of the reference's model zoo (SURVEY.md §2 L5):

- ``tokenizer``   trainable WordPiece (no downloaded vocabs)
- ``bert``        encoder + break-tagging head (pause_bert.py parity)
- ``bilstm``      BiLSTM prosody regressor (bilstm.py parity)
- ``llm``         Qwen2-style decoder with LoRA, pjit-sharded (QwenA/B)
- ``fewshot``     zero/few-shot SSML prediction harness (fewshot/model.py)
- ``datasets``    bdd.json → token/label/regression datasets
"""

from . import tokenizer, bert, bilstm, llm, lora  # noqa: F401
