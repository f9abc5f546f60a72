from mal_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_step,
)
from mal_tpu.parallel.distributed import (  # noqa: F401
    initialize as initialize_distributed,
    is_multihost,
    make_global_mesh,
    shard_host_batch,
)
