from .mesh import MeshConfig, create_mesh, mesh_from_count, batch_spec, partition_params, shard_batch, gather_to_host
from .step import make_train_step, make_eval_step
from .prefetch import prefetch_to_device
