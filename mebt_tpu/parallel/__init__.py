from mebt_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    mebt_param_rules,
    shard_pytree,
    spec_for_tree,
)
