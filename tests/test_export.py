"""Serving-artifact export: round-trip exactness, batch polymorphism,
multi-platform lowering, and the exported fused VPP program."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial

from tensor_stream_tpu.enums import FourCC, Planes, ResizeType
from tensor_stream_tpu.export import export_inference, load_inference
from tensor_stream_tpu.models.video_vit import VideoViT, init_vit
from tensor_stream_tpu.ops.vpp import VPPConfig, make_vpp_fn

CLIP = (2, 4, 32, 32, 3)


def vit_and_params():
    model = VideoViT(num_classes=2, depth=2, dim=32, num_heads=2,
                     patch=8, tubelet_t=2, compute_dtype=jnp.float32)
    params = init_vit(jax.random.PRNGKey(0), model, CLIP)
    return model, params


def test_model_roundtrip_bitexact(tmp_path):
    model, params = vit_and_params()
    fn = partial(model.apply, params)
    clips = jax.random.uniform(jax.random.PRNGKey(1), CLIP)
    path = str(tmp_path / "vit.shlo")
    export_inference(fn, (clips,), path)
    serve = load_inference(path)
    np.testing.assert_array_equal(np.asarray(serve(clips)),
                                  np.asarray(jax.jit(fn)(clips)))


def test_batch_polymorphic_export(tmp_path):
    """Exported once with a symbolic batch: serves batch 1, 2 and 5."""
    model, params = vit_and_params()
    fn = partial(model.apply, params)
    path = str(tmp_path / "vit_poly.shlo")
    export_inference(fn, (jnp.zeros(CLIP, jnp.float32),), path,
                     batch_poly=True)
    serve = load_inference(path)
    for b in (1, 2, 5):
        clips = jax.random.uniform(jax.random.PRNGKey(b),
                                   (b,) + CLIP[1:])
        got = np.asarray(serve(clips))
        want = np.asarray(jax.jit(fn)(clips))
        assert got.shape == (b, 2)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_multi_platform_artifact(tmp_path):
    """The default export carries both cpu and tpu lowerings."""
    model, params = vit_and_params()
    exp = export_inference(partial(model.apply, params),
                           (jnp.zeros(CLIP, jnp.float32),))
    assert set(exp.platforms) == {"cpu", "tpu"}


def test_exported_vpp_program_bitexact(tmp_path):
    """The fused NV12→RGB VPP program exports and reloads bit-exactly —
    the serving-side decode companion."""
    cfg = VPPConfig(src_width=128, src_height=96, width=64, height=64,
                    resize_type=ResizeType.BILINEAR, fourcc=FourCC.RGB24,
                    planes=Planes.MERGED, normalization=False)
    vpp = make_vpp_fn(cfg)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 255, (96, 128), np.uint8))
    uv = jnp.asarray(rng.integers(0, 255, (48, 128), np.uint8))
    path = str(tmp_path / "vpp.shlo")
    export_inference(vpp, (y, uv), path)
    serve = load_inference(path)
    np.testing.assert_array_equal(np.asarray(serve(y, uv)),
                                  np.asarray(jax.jit(vpp)(y, uv)))
