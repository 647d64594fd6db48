"""jax.Array -> torch.Tensor bridge (migration aid).

The reference returned `torch.Tensor`s on `cuda:N`
(reference: src/Wrappers/WrapperPython.cpp:315-343); this framework
returns `jax.Array`s on TPU. Users whose downstream models are still
torch can bridge per batch:

    from tensor_stream_tpu.utils.torch_interop import to_torch
    tensors, idx = loader_or_reader.read_batch(...)
    batch = to_torch(tensors)   # torch.Tensor

On CPU/GPU JAX backends the conversion is zero-copy (DLPack). TPU
buffers have no host-visible DLPack view, so they are fetched once to
host memory and wrapped zero-copy from there — the natural hand-off
point when the torch model runs on CPU/GPU anyway. (If the model is
being ported to TPU, feed the jax.Array directly instead.)
"""


def to_torch(x, copy=False):
    """Converts a jax.Array (or numpy array) to a torch.Tensor.

    Zero-copy via DLPack where the backend supports it; otherwise one
    device-to-host fetch, then a zero-copy numpy wrap.

    A zero-copy result ALIASES the XLA buffer, which JAX treats as
    immutable — in-place torch ops (`sub_`, `mul_`, ...) on it are
    undefined behavior against the still-live jax.Array (the reference
    had the same contract: its tensors aliased decoder-owned CUDA
    memory, WrapperPython.cpp:315-343). Pass copy=True when the tensor
    will be mutated."""
    import torch
    try:
        t = torch.utils.dlpack.from_dlpack(x)
        return t.clone() if copy else t
    except (AttributeError, BufferError, RuntimeError, TypeError):
        import numpy as np
        arr = np.asarray(x)
        if copy or not arr.flags.writeable:
            # torch tensors must be writable; a read-only view means
            # zero-copy was impossible anyway, so take the one copy.
            arr = np.array(arr)
        return torch.from_numpy(arr)
