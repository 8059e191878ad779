from hyena_dna_tpu.parallel.sharding import (
    make_mesh,
    param_sharding_rules,
    shard_params,
    commit_state_to_mesh,
    batch_spec,
)

__all__ = [
    "make_mesh",
    "param_sharding_rules",
    "shard_params",
    "commit_state_to_mesh",
    "batch_spec",
]
