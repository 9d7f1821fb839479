"""Mesh + GSPMD sharding layer (new in this framework; SURVEY.md §2.5)."""

from quanta_tpu.parallel.distributed import (
    host_batch_spec,
    host_cache_specs,
    host_fsdp_param_specs,
    host_llama_param_specs,
    initialize,
    make_host_mesh,
    process_batch_slice,
    shard_params_host,
)
from quanta_tpu.parallel.sharding import (
    cache_specs,
    check_divisibility,
    check_fsdp_divisibility,
    expand_specs,
    fsdp_param_specs,
    llama_param_specs,
    make_mesh,
    shard_cache,
    shard_params,
)

__all__ = [
    "initialize",
    "make_host_mesh",
    "host_llama_param_specs",
    "host_fsdp_param_specs",
    "host_cache_specs",
    "host_batch_spec",
    "shard_params_host",
    "process_batch_slice",
    "make_mesh",
    "llama_param_specs",
    "fsdp_param_specs",
    "cache_specs",
    "expand_specs",
    "shard_params",
    "shard_cache",
    "check_divisibility",
    "check_fsdp_divisibility",
]
