from kmerax.dist.mesh import (
    MeshSpec, make_mesh, init_distributed, local_batch_slice,
)
from kmerax.dist.partition import (
    match_partition_rules, make_shard_fns, make_gather_fns,
)
