"""Multi-chip scaling: device meshes, sharded VPP, sharded training step.

The reference scales by one-GPU-per-instance (cuda_device parameter,
reference: python_examples/different_streams.py:76-99) with no
collectives. On TPU the idiomatic scale-out is SPMD over a
jax.sharding.Mesh:

 * data parallel ('dp'): independent streams / frame batches per chip;
 * model/spatial parallel ('mp'): frame rows (sequence-parallel over H)
   for the VPP, conv channels for the style network — XLA inserts the
   halo exchanges / all-reduces over ICI.

Everything here works on any mesh shape, including a virtual
`--xla_force_host_platform_device_count=N` CPU mesh for testing.
"""
import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.transformer_net import (TransformerNet, gram_matrix,
                                      init_params, style_transfer_loss)
from ..ops.vpp import VPPConfig, make_vpp_fn


def make_mesh(n_devices: int | None = None, axes=("dp", "mp")) -> Mesh:
    """Builds a 2D mesh over the first n devices, factoring n into a
    near-square (dp, mp) grid so both batch and model axes can scale."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    mp = 1
    for cand in range(int(math.isqrt(n)), 0, -1):
        if n % cand == 0:
            mp = cand
            break
    dp = n // mp
    return Mesh(np.asarray(devices).reshape(dp, mp), axes)


# ------------------------------------------------------------- sharded VPP

@lru_cache(maxsize=64)
def _sharded_vpp(cfg: VPPConfig, mesh: Mesh):
    fn = jax.vmap(make_vpp_fn(cfg))

    def with_constraint(ys, uvs):
        # Batch over 'dp', frame rows over 'mp' (sequence/spatial
        # parallelism of the VPP; XLA turns the resize gathers into halo
        # exchanges over ICI).
        ys = jax.lax.with_sharding_constraint(
            ys, NamedSharding(mesh, P("dp", "mp", None)))
        uvs = jax.lax.with_sharding_constraint(
            uvs, NamedSharding(mesh, P("dp", "mp", None)))
        out = fn(ys, uvs)
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P("dp")))

    return jax.jit(with_constraint,
                   in_shardings=(NamedSharding(mesh, P("dp", "mp", None)),
                                 NamedSharding(mesh, P("dp", "mp", None))),
                   out_shardings=NamedSharding(mesh, P("dp")))


def vpp_batch_sharded(cfg: VPPConfig, mesh: Mesh, ys, uvs):
    """Converts a [N, H, W] NV12 batch with N sharded over 'dp' and rows
    over 'mp'. N must be divisible by the 'dp' axis size."""
    return _sharded_vpp(cfg, mesh)(ys, uvs)


# --------------------------------------------------- sharded training step

def param_sharding(params, mesh: Mesh):
    """Tensor-parallel layout for TransformerNet: shard each conv kernel's
    output-channel axis over 'mp' when divisible (128/64/32 channels divide
    any small mp), replicate the rest. XLA inserts the all-gathers /
    reduce-scatters this layout implies."""
    mp = mesh.shape["mp"]

    def spec(x):
        if x.ndim == 4 and x.shape[-1] % mp == 0:    # conv kernels HWIO
            return NamedSharding(mesh, P(None, None, None, "mp"))
        if x.ndim == 1 and x.shape[0] % mp == 0:     # bias / IN scale
            return NamedSharding(mesh, P("mp"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, params)


def make_train_state(mesh: Mesh, height=64, width=64, batch=8,
                     learning_rate=1e-3, rng=None):
    """Initializes params + optimizer state laid out over the mesh."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = init_params(rng, height, width, batch)
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    p_shard = param_sharding(params, mesh)
    params = jax.device_put(params, p_shard)
    opt_state = jax.device_put(
        opt_state, jax.tree_util.tree_map(
            lambda x: (param_sharding({"x": x}, mesh)["x"]
                       if hasattr(x, "ndim") else NamedSharding(mesh, P())),
            opt_state, is_leaf=lambda x: hasattr(x, "ndim")))
    return params, opt_state, tx


def build_train_step(mesh: Mesh, tx, vpp_cfg: VPPConfig | None = None):
    """Returns a jitted full training step:

      NV12 batch --(sharded VPP: dp x mp)--> RGB float --(TransformerNet
      fwd+bwd, dp on batch / mp on channels)--> adam update

    i.e. the end-to-end "video in, gradient step out" path of the
    fast_neural_style example, SPMD over the mesh.
    """
    model = TransformerNet()
    apply_fn = lambda p, x: model.apply(p, x)
    vpp = jax.vmap(make_vpp_fn(vpp_cfg)) if vpp_cfg is not None else None

    def step(params, opt_state, ys, uvs, style_grams):
        if vpp is not None:
            ys = jax.lax.with_sharding_constraint(
                ys, NamedSharding(mesh, P("dp", "mp", None)))
            uvs = jax.lax.with_sharding_constraint(
                uvs, NamedSharding(mesh, P("dp", "mp", None)))
            content = vpp(ys, uvs)  # [N, H, W, 3] float (merged RGB)
        else:
            content = ys
        content = jax.lax.with_sharding_constraint(
            content, NamedSharding(mesh, P("dp")))
        loss, grads = jax.value_and_grad(
            lambda p: style_transfer_loss(apply_fn, p, content, style_grams))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def multi_stream_round_robin(n_streams: int, mesh: Mesh):
    """Maps stream index -> device index, one pipeline per chip — the
    TPU equivalent of the reference's one-GPU-per-instance pattern."""
    devices = mesh.devices.reshape(-1)
    return {i: devices[i % len(devices)] for i in range(n_streams)}
