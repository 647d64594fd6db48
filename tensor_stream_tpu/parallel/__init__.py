"""Multi-chip scaling: meshes, sharded VPP, sharded training step."""
from .sharding import (make_mesh, vpp_batch_sharded, make_train_state,
                       build_train_step, multi_stream_round_robin,
                       param_sharding)  # noqa: F401
