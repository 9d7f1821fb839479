"""Mesh + GSPMD sharding layer (new in this framework; SURVEY.md §2.5)."""

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
