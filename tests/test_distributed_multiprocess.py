"""Real multi-process jax.distributed validation (VERDICT round-1 item 7).

Spawns two OS processes running ``tests/dist_worker.py`` against a live
coordinator: ``parallel.distributed.initialize`` (gloo CPU collectives),
the ("dcn", "data", "model") hybrid mesh with one slice per process,
per-host batch feeding, and a cross-process jnp.sum checked against the
full-batch value by BOTH processes. This is the code path that no
single-process test can reach.

Also covers the non-degenerate single-process hybrid_mesh shapes via the
explicit ``slices`` override on the 8-device virtual CPU mesh.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

HERE = Path(__file__).resolve().parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_psum():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PCFT_NUM_PROCESSES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(HERE / "dist_worker.py"), str(pid), "2", str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=HERE.parent,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err}"
    assert "proc 0 OK" in outs[0][1]
    assert "proc 1 OK" in outs[1][1]
    # both processes computed the same full-batch reduction
    sums = {line.split("sum=")[1] for rc, out, _ in outs for line in out.splitlines() if "sum=" in line}
    assert len(sums) == 1, sums


class TestHybridMeshShapes:
    def test_explicit_slices_non_degenerate(self):
        import jax

        from prosody_control_french_tts_tpu.parallel.distributed import hybrid_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        mesh = hybrid_mesh(model=2, slices=2)
        assert mesh.devices.shape == (2, 2, 2)
        assert mesh.axis_names == ("dcn", "data", "model")

        # a data-sharded program executes over the non-degenerate mesh
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = jnp.arange(32.0).reshape(8, 4)
        arr = jax.device_put(x, NamedSharding(mesh, P(("dcn", "data"))))
        out = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
        assert float(out) == float(np.arange(32.0).sum())

    def test_indivisible_slices_rejected(self):
        import jax

        from prosody_control_french_tts_tpu.parallel.distributed import hybrid_mesh

        if len(jax.devices()) != 8:
            pytest.skip("needs exactly the 8-device virtual mesh")
        with pytest.raises(ValueError):
            hybrid_mesh(model=1, slices=3)
