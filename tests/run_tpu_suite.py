"""Process-isolated TPU test runner (VERDICT round-2 item 6).

Running a whole kernel-test FILE against the real chip in one process hits
JaxRuntimeErrors mid-suite (UNIMPLEMENTED transfer failures) that vanish
when the same tests run individually — and this session caught the remote
backend outright wedging a process after it accumulated many distinct
executables (see ROADMAP "mid-suite" note). The failure is tunnel/backend
state, not kernel code, so hardware validation runs each test CLASS in its
own process: fresh backend, bounded executable count, one flaky-retry for
transient tunnel errors.

Usage (from the repo root, session env pointing JAX at the TPU):

    python tests/run_tpu_suite.py                 # kernel suite on TPU
    python tests/run_tpu_suite.py tests/test_ops_dsp.py tests/test_aligners.py
    python tests/run_tpu_suite.py --timeout 1200  # slow cold-cache run

Exit code 0 iff every class passes (after at most one retry each).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from collections import defaultdict
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# the hardware-parity surface: kernel + model + aligner correctness
DEFAULT_FILES = [
    "tests/test_ops_dsp.py",
    "tests/test_measure_golden.py",
    "tests/test_corpus_golden.py",
    "tests/test_aligners.py",
    "tests/test_whisper_pretrained.py",
    "tests/test_ctc_pretrained.py",
    "tests/test_native_and_pallas.py",
]


def collect_groups(files: list[str]) -> dict[str, list[str]]:
    """node-id groups keyed by file::Class (classless tests group per file)."""
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", *files],
        cwd=ROOT,
        capture_output=True,
        text=True,
    )
    groups: dict[str, list[str]] = defaultdict(list)
    for line in out.stdout.splitlines():
        line = line.strip()
        if "::" not in line or line.startswith(("=", "<")):
            continue
        parts = line.split("::")
        key = "::".join(parts[:2]) if len(parts) >= 3 else parts[0]
        groups[key].append(line)
    return dict(groups)


def run_group(key: str, nodes: list[str], timeout: float) -> tuple[bool, str]:
    env = dict(os.environ, PCFT_TEST_TPU="1")
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider", *nodes],
            cwd=ROOT,
            env=env,
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return False, "TIMEOUT"
    tail = (proc.stdout or "").strip().splitlines()
    return proc.returncode == 0, tail[-1] if tail else f"rc={proc.returncode}"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", default=None)
    ap.add_argument("--timeout", type=float, default=900.0, help="per-class seconds")
    ap.add_argument("--retries", type=int, default=1, help="per-class flaky retries")
    args = ap.parse_args(argv)
    files = args.files or DEFAULT_FILES
    groups = collect_groups(files)
    if not groups:
        print("no tests collected", file=sys.stderr)
        return 2
    print(f"{len(groups)} isolated class runs over {len(files)} files")
    failures = []
    t_all = time.time()
    for key, nodes in sorted(groups.items()):
        ok, last = False, ""
        for attempt in range(args.retries + 1):
            t0 = time.time()
            ok, last = run_group(key, nodes, args.timeout)
            status = "ok" if ok else f"FAIL ({last})"
            retry = f" [retry {attempt}]" if attempt else ""
            print(f"  {key}: {status} {time.time() - t0:.0f}s{retry}", flush=True)
            if ok:
                break
        if not ok:
            failures.append((key, last))
    print(f"total {time.time() - t_all:.0f}s — {len(groups) - len(failures)}/{len(groups)} classes green")
    for key, last in failures:
        print(f"  STILL FAILING: {key}: {last}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
