"""Distributed layer: mesh construction, sharding policies, collectives.

This layer is NEW relative to the reference (SURVEY.md §2 "Parallelism &
distributed-communication inventory": the reference's only parallelism is
an OS process pool per voice). Here:

- voices/segments become batch axes sharded over ``data``;
- the LLM shards megatron-style over ``model`` (TP);
- collectives are inserted by XLA from sharding annotations — there is no
  NCCL/MPI analogue to port.
"""

from .mesh import make_mesh, local_mesh, data_sharding, replicated  # noqa: F401
from .sharding import llm_param_spec, shard_params  # noqa: F401
