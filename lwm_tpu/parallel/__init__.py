from lwm_tpu.parallel.mesh import (
    MESH_AXES,
    create_mesh,
    get_ranks_and_size,
    initialize_distributed,
)
from lwm_tpu.parallel.partition import (
    match_partition_rules,
    make_shard_and_gather_fns,
    with_sharding_constraint,
    named_tree_map,
    tree_path_to_string,
    get_weight_decay_mask,
    get_frozen_mask,
)
