"""VPP compute ops (JAX/XLA/Pallas): crop, resize, color conversion."""
from .vpp import VPPConfig, build_vpp, build_vpp_batched, vpp_numpy  # noqa: F401
