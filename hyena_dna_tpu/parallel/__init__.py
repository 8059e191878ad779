from hyena_dna_tpu.parallel.sharding import (
    make_mesh,
    param_sharding_rules,
    shard_params,
    batch_spec,
)

__all__ = ["make_mesh", "param_sharding_rules", "shard_params", "batch_spec"]
