"""TrainCheckpointer: sharded save/restore, mesh-resharding restore,
retention, and the joint model+loader-cursor round trip."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tensor_stream_tpu.checkpoint import TrainCheckpointer
from tensor_stream_tpu.models.video_vit import VideoViT, init_vit, \
    make_vit_train_step
from tensor_stream_tpu.parallel import make_mesh

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")

CLIP = (4, 4, 16, 16, 3)


def tiny_state(mesh):
    # 4 heads: divisible by mp on both the 4x2 and the reversed 2x4
    # mesh layouts the reshard test restores across.
    model = VideoViT(num_classes=2, depth=2, dim=32, num_heads=4,
                     patch=8, tubelet_t=2, compute_dtype=jnp.float32)
    tx = optax.adam(1e-3)
    params = init_vit(jax.random.PRNGKey(0), model, CLIP)
    shard_params, step = make_vit_train_step(mesh, model, tx)
    params = shard_params(params)
    opt = tx.init(params)
    return {"params": params, "opt": opt}, step


def assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@needs_mesh
def test_sharded_roundtrip_same_mesh(tmp_path):
    mesh = make_mesh(8, axes=("dp", "mp"))
    state, _ = tiny_state(mesh)
    with TrainCheckpointer(str(tmp_path)) as ckpt:
        assert ckpt.save(7, state, loader_state={"stream_url": "x.mp4",
                                                 "epoch": 2,
                                                 "start_clip": 13,
                                                 "seed": 5})
        step, restored, loader = ckpt.restore(template=state)
    assert step == 7
    assert loader == {"stream_url": "x.mp4", "epoch": 2,
                      "start_clip": 13, "seed": 5}
    assert_tree_equal(state, restored)
    # Shardings survive: restored leaves live on the same mesh layout.
    k = restored["params"]["params"]["block0"]["attn_s"]["query"]["kernel"]
    assert len(k.addressable_shards) == 8


@needs_mesh
def test_restore_reshards_to_new_mesh(tmp_path):
    """Saved on the ('dp','mp') 4x2 mesh, restored onto a REVERSED 2x4
    layout: values bit-equal, placement follows the template."""
    mesh_a = make_mesh(8, axes=("dp", "mp"))
    state, _ = tiny_state(mesh_a)
    with TrainCheckpointer(str(tmp_path)) as ckpt:
        ckpt.save(0, state)

        devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh_b = Mesh(devices, ("dp", "mp"))

        def retarget(x):
            spec = getattr(x.sharding, "spec", P())
            return jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=NamedSharding(mesh_b, spec))

        template = jax.tree_util.tree_map(retarget, state)
        _, restored, _ = ckpt.restore(step=0, template=template)
    assert_tree_equal(state, restored)
    k = restored["params"]["params"]["block0"]["attn_s"]["query"]["kernel"]
    assert k.sharding.mesh.shape["mp"] == 4


@needs_mesh
def test_restore_to_single_device(tmp_path):
    """template=None: a multi-device checkpoint restores fully
    replicated/unsharded for single-chip inference."""
    mesh = make_mesh(8, axes=("dp", "mp"))
    state, _ = tiny_state(mesh)
    with TrainCheckpointer(str(tmp_path)) as ckpt:
        ckpt.save(0, state)
        _, restored, loader = ckpt.restore(step=0)
    assert loader is None
    assert_tree_equal(state, restored)


def test_retention_and_latest(tmp_path):
    x = {"w": jnp.arange(8, dtype=jnp.float32)}
    with TrainCheckpointer(str(tmp_path), max_to_keep=2) as ckpt:
        for s in (1, 2, 3, 4):
            ckpt.save(s, jax.tree_util.tree_map(lambda v: v * s, x))
        assert ckpt.latest_step() == 4
        assert ckpt.all_steps() == [3, 4]
        step, restored, _ = ckpt.restore(template=x)
    assert step == 4
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(8, dtype=np.float32) * 4)


@needs_mesh
def test_training_resumes_identically(tmp_path):
    """step -> save -> two more steps must equal restore -> same two
    steps (the optimizer state round-trips exactly)."""
    mesh = make_mesh(8, axes=("dp", "mp"))
    state, step_fn = tiny_state(mesh)
    rng = np.random.default_rng(0)
    clips = rng.uniform(0, 1, CLIP).astype(np.float32)
    mask = np.array([True, False, False, True])

    p, o = state["params"], state["opt"]
    p, o, _, _ = step_fn(p, o, clips, mask)
    with TrainCheckpointer(str(tmp_path)) as ckpt:
        ckpt.save(1, {"params": p, "opt": o})
        # Branch A: keep training in-process.
        pa, oa = p, o
        for _ in range(2):
            pa, oa, _, _ = step_fn(pa, oa, clips, mask)
        # Branch B: restore and train the same two steps.
        _, restored, _ = ckpt.restore(step=1,
                                      template={"params": pa, "opt": oa})
    pb, ob = restored["params"], restored["opt"]
    for _ in range(2):
        pb, ob, _, _ = step_fn(pb, ob, clips, mask)
    assert_tree_equal(pa, pb)
