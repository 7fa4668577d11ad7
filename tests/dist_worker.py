"""Worker process for tests/test_distributed_multiprocess.py.

Run as ``python dist_worker.py <process_id> <num_processes> <port>`` with
``XLA_FLAGS=--xla_force_host_platform_device_count=2`` so each OS process
exposes two virtual CPU devices: 2 processes × 2 devices = a 4-device
global topology where cross-process traffic models DCN.

Exercises the previously never-executed multi-process paths of
``parallel/distributed.py`` (SURVEY.md §5 "distributed communication
backend"): jax.distributed.initialize over a real coordinator, the
("dcn", "data", "model") hybrid mesh with one slice per process, per-host
data feeding, and a cross-process reduction whose result every process
checks against the full-batch value.
"""

from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from prosody_control_french_tts_tpu.parallel.distributed import (  # noqa: E402
    host_local_batch_slice,
    hybrid_mesh,
    initialize,
)


def main() -> None:
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    assert initialize(f"localhost:{port}", num_processes=n, process_id=pid)
    assert jax.process_count() == n, jax.process_count()
    assert len(jax.devices()) == 2 * n, len(jax.devices())

    # one slice per process (DCN across the process boundary)
    mesh = hybrid_mesh(model=1)
    assert mesh.devices.shape == (n, 2, 1), mesh.devices.shape
    assert mesh.axis_names == ("dcn", "data", "model")

    # per-host data loading: every process materialises only its batch rows,
    # the global reduction must still see the whole batch
    B, D = 8, 4
    full = np.arange(B * D, dtype=np.float32).reshape(B, D)
    local = full[host_local_batch_slice(B)]
    sharding = NamedSharding(mesh, P(("dcn", "data")))
    arr = jax.make_array_from_process_local_data(sharding, local, global_shape=(B, D))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
    expect = float(full.sum())
    got = float(total)
    assert abs(got - expect) < 1e-5, (got, expect)

    # non-degenerate hybrid mesh with tensor parallelism inside the slice
    mesh2 = hybrid_mesh(model=2)
    assert mesh2.devices.shape == (n, 1, 2), mesh2.devices.shape

    print(f"proc {pid} OK sum={got}", flush=True)


if __name__ == "__main__":
    main()
