from dexgangrasp_tpu.parallel.mesh import make_mesh, data_parallel_mesh
from dexgangrasp_tpu.parallel.sharding import (
    batch_spec,
    replicated_spec,
    shard_batch,
    replicate,
    gan_param_specs,
    evaluator_param_specs,
    sharded_gan_step,
    sharded_sample_and_score,
)
