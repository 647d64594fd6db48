"""Model families: the fast-neural-style TransformerNet (flax)."""
from .transformer_net import (TransformerNet, init_params, gram_matrix,
                              style_transfer_loss)  # noqa: F401
