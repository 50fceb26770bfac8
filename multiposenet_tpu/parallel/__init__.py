from multiposenet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from multiposenet_tpu.parallel import distributed

