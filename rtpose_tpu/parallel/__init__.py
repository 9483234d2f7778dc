from .mesh import (
    make_mesh,
    replicate,
    shard_batch,
    batch_sharding,
    process_count,
    process_index,
    all_gather_objects,
)
