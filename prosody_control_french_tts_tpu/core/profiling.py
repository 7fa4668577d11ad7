"""Tracing & per-step timing (SURVEY.md §5: the reference has only tqdm
bars; this framework makes observability first-class).

- ``StepTimer``: wall-clock per pipeline step, JSON-line dump alongside the
  run's results (the quantitative run manifest).
- ``device_trace``: context manager around ``jax.profiler.trace`` writing a
  TensorBoard-loadable trace for the jitted programs.
- ``log_compile_cache``: one-line summary of persistent-compile-cache hits
  (compiles dominate cold-start cost on small hosts — see bench.py).
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from dataclasses import dataclass, field
from pathlib import Path

log = logging.getLogger(__name__)


@dataclass
class StepTimer:
    records: list[dict] = field(default_factory=list)

    @contextlib.contextmanager
    def step(self, name: str, **meta):
        t0 = time.perf_counter()
        err = None
        try:
            yield
        except Exception as e:  # noqa: BLE001 — recorded then re-raised
            err = repr(e)
            raise
        finally:
            self.records.append(
                {
                    "step": name,
                    "seconds": round(time.perf_counter() - t0, 4),
                    "error": err,
                    **meta,
                }
            )

    def dump(self, path: str | Path) -> None:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        with open(p, "w", encoding="utf-8") as f:
            for r in self.records:
                f.write(json.dumps(r) + "\n")

    def total_seconds(self) -> float:
        return sum(r["seconds"] for r in self.records)


# Fine-grained phase accounting inside pipeline steps (which step is slow is
# answered by StepTimer; WHY it is slow — host prep vs transfer vs launch vs
# postprocess — is answered here). Always on: one perf_counter pair per phase.
PHASES: dict[str, float] = {}


@contextlib.contextmanager
def phase(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        PHASES[name] = PHASES.get(name, 0.0) + time.perf_counter() - t0


def reset_phases() -> None:
    PHASES.clear()


@contextlib.contextmanager
def device_trace(trace_dir: str | Path, enabled: bool = True):
    """jax.profiler trace for TensorBoard (no-op when disabled or when the
    backend can't trace, e.g. over the axon tunnel)."""
    if not enabled:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(str(trace_dir))
        started = True
    except Exception as e:  # noqa: BLE001 — tracing is best-effort
        log.warning("profiler trace unavailable: %s", e)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # noqa: BLE001
                log.warning("profiler stop failed: %s", e)


def enable_compile_cache(cache_dir: str | Path = ".jax_cache", min_secs: float = 1.0) -> None:
    """Persistent XLA compile cache — cold-start compiles of the measure
    program cost minutes on 1-vCPU hosts; cache hits cost milliseconds."""
    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", float(min_secs))
