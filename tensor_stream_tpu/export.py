"""Serving-artifact export: jitted inference functions → StableHLO bytes.

Deployment story the TPU way: `jax.export` lowers a jitted function
(the fused VPP program, a model forward, or the whole decode-side
pipeline step) to a serialized StableHLO artifact that a serving
process reloads WITHOUT the Python model code — only the artifact and
the input arrays. Two properties matter for production:

  * multi-platform: one artifact lowered for both "tpu" and "cpu"
    runs on the serving fleet and on host-side canaries/CI;
  * batch polymorphism: exported with a symbolic leading axis, one
    artifact serves any batch size (XLA specializes at call time).

The reference's deployment unit was a .so + Python wheel tied to the
exact torch/CUDA build (reference: setup.py, CMakeLists.txt); an
exported StableHLO artifact is self-contained and versioned by
StableHLO's compatibility guarantees instead.

    from tensor_stream_tpu.export import export_inference, load_inference
    export_inference(lambda clips: model.apply(params, clips),
                     (jnp.zeros((1, 8, 112, 112, 3), jnp.float32),),
                     "model.shlo", batch_poly=True)
    ...
    serve = load_inference("model.shlo")     # no model code needed
    logits = serve(clips_any_batch)
"""
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
from jax import export as jex


def export_inference(fn: Callable, example_args: Tuple[Any, ...],
                     path: Optional[str] = None, *,
                     platforms: Sequence[str] = ("cpu", "tpu"),
                     batch_poly: bool = False) -> "jex.Exported":
    """Lowers `fn(*example_args)` for `platforms` and serializes it.

    `fn` must close over its weights (e.g. `partial(model.apply,
    params)`): the artifact is self-contained. With `batch_poly=True`
    the leading axis of every example arg becomes one shared symbolic
    dimension "b" — the artifact then accepts any batch size.
    Returns the jax.export.Exported (also written to `path` if given).
    """
    jfn = jax.jit(fn)
    if batch_poly:
        args = jex.symbolic_args_specs(example_args, "b, ...")
    else:
        args = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype)
                     for a in example_args)
    exp = jex.export(jfn, platforms=list(platforms))(*args)
    if path is not None:
        with open(path, "wb") as f:
            f.write(exp.serialize())
    return exp


def load_inference(path_or_bytes) -> Callable:
    """Reloads an exported artifact as a jittable callable.

    Accepts a file path or the serialized bytes. The returned callable
    runs on whatever backend jax selects at call time, provided the
    artifact was exported for that platform.
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    exp = jex.deserialize(data)
    return jax.jit(exp.call)
