"""torch.utils.data adapter — serve tensor-stream-tpu batches to torch.

Reference users train torch models; this adapter lets them keep the
whole torch training loop and swap only the input pipeline: any
tensor-stream-tpu loader (FrameLoader, ClipLoader, ClipDataset, the
multi-stream family) becomes a `torch.utils.data.IterableDataset`
whose items are `(torch.Tensor, indices)` — zero-copy from the jax
buffer where the backend allows (utils/torch_interop.py).

    ds = TorchFrameDataset(lambda: ClipLoader("video.mp4", clip_len=8,
                                              batch=4, width=224,
                                              height=224, ...))
    dl = torch.utils.data.DataLoader(ds, batch_size=None, num_workers=0)
    for clips, starts in dl:          # torch.Tensor [4, 8, 224, 224, 3]
        out = torch_model(clips)

`batch_size=None` passes the loader's device batches straight through
(they are already batched); `num_workers` must stay 0 — decode
parallelism lives in the native workers, and forking the process would
duplicate the stream, not shard it.
"""
from typing import Callable

import torch.utils.data as tud

from .torch_interop import to_torch


class TorchFrameDataset(tud.IterableDataset):
    """IterableDataset over a loader factory (fresh loader per epoch)."""

    def __init__(self, make_loader: Callable, copy: bool = False):
        """`make_loader()` must return a fresh loader each call (a new
        epoch/iteration re-opens the stream); `copy=True` detaches each
        item from the jax buffer (needed before in-place torch ops)."""
        self.make_loader = make_loader
        self.copy = copy

    def __iter__(self):
        import torch.utils.data as tud
        # get_worker_info() is non-None ONLY inside a DataLoader worker
        # process — any num_workers >= 1 means we were forked, which
        # would duplicate the native decode runtime and JAX state.
        info = tud.get_worker_info()
        if info is not None:
            raise RuntimeError(
                "TorchFrameDataset requires num_workers=0: decode "
                "parallelism lives in the native workers; forked "
                "DataLoader workers would duplicate the stream")
        loader = self.make_loader()
        try:
            for tensors, indices in loader:
                yield to_torch(tensors, copy=self.copy), indices
        finally:
            loader.close()
