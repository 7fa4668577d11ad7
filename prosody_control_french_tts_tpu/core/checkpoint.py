"""Model checkpointing (orbax) + pipeline-step resume markers.

The reference's recovery story (SURVEY.md §5): HF-Trainer step checkpoints
for the LLMs, ``checkpoint_<step>_done.txt`` markers for legacy pipeline
stages, and on-disk artifacts enabling ``steps_to_run`` resume. Here:

- ``save_train_state``/``restore_train_state``: orbax PyTree checkpoints
  of (params, opt_state, step) with a keep-last-N policy
  (save_total_limit=2 in the reference, QwenB.py:218);
- ``StepMarkers``: the checkpoint-file contract used by legacy.Voc and
  available to any pipeline.
"""

from __future__ import annotations

import logging
from pathlib import Path

log = logging.getLogger(__name__)


def save_train_state(ckpt_dir: str | Path, step: int, state: dict, keep: int = 2) -> Path:
    """state: any pytree dict, e.g. {'params':…, 'opt_state':…}."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"step_{step:08d}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    # retention: keep the newest `keep`
    all_steps = sorted(ckpt_dir.glob("step_*"))
    for old in all_steps[:-keep]:
        import shutil

        shutil.rmtree(old, ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir: str | Path) -> Path | None:
    steps = sorted(Path(ckpt_dir).glob("step_*"))
    return steps[-1] if steps else None


def restore_train_state(ckpt_dir: str | Path, template: dict, step: int | None = None) -> tuple[dict, int]:
    """Restore into the shape/dtype structure of ``template``. Returns
    (state, step)."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    path = ckpt_dir / f"step_{step:08d}" if step is not None else latest_checkpoint(ckpt_dir)
    if path is None or not path.exists():
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path, target=template)
    return state, int(path.name.split("_")[1])


class StepMarkers:
    """checkpoint_<step>_done.txt contract (pipeline_class_legacy.py:545-562)."""

    def __init__(self, out_dir: str | Path, enabled: bool = True):
        self.out_dir = Path(out_dir)
        self.enabled = enabled
        self.out_dir.mkdir(parents=True, exist_ok=True)

    def path(self, step: str) -> Path:
        return self.out_dir / f"checkpoint_{step}_done.txt"

    def done(self, step: str) -> bool:
        return self.enabled and self.path(step).exists()

    def mark(self, step: str) -> None:
        self.path(step).write_text("done", encoding="utf-8")

    def clear(self) -> None:
        for p in self.out_dir.glob("checkpoint_*_done.txt"):
            p.unlink()
