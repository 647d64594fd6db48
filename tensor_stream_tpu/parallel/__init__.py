"""Multi-chip scaling: meshes, sharded VPP, sharded training steps
(dp/tensor/sequence in sharding.py + video_vit.py, pipeline here)."""
from .sharding import (make_mesh, vpp_batch_sharded, make_train_state,
                       build_train_step, multi_stream_round_robin,
                       param_sharding)  # noqa: F401
from .pipeline import (make_pp_mesh, init_pp_params, pp_apply,  # noqa: F401
                       make_pp_train_step)
from .accum import accumulate_gradients  # noqa: F401
