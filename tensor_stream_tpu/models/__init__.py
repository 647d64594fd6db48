"""Model families: the fast-neural-style TransformerNet and the
factorized space-time VideoViT (flax)."""
from .transformer_net import (TransformerNet, init_params, gram_matrix,
                              style_transfer_loss)  # noqa: F401
from .video_vit import (VideoViT, init_vit, make_act_sharding,  # noqa: F401
                        make_vit_train_step, vit_param_specs)
from .moe import (VideoMoE, MoEMLP, make_moe_train_step,  # noqa: F401
                  moe_param_specs)
from .quantize import (quantize_weights, dequantize_weights,  # noqa: F401
                       quantized_bytes, quantization_error)
from .streaming import init_stream_cache, stream_step  # noqa: F401
from .video_vae import (VideoVAE, vae_loss,  # noqa: F401
                        make_vae_train_step)
from .latent_diffusion import (VideoDiT, DiffusionSchedule,  # noqa: F401
                               make_diffusion_train_step, ddim_sample,
                               make_conditional_diffusion_train_step)
