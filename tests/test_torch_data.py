"""torch.utils.data adapter: byte parity with the direct loader, torch
DataLoader integration, epoch re-iteration, worker guard."""
import os

import numpy as np
import pytest

from tensor_stream_tpu import FourCC, FrameLoader, Planes

from conftest import BUNNY

torch = pytest.importorskip("torch")

needs_fixture = pytest.mark.skipif(not os.path.exists(BUNNY),
                                   reason="reference fixtures absent")

KW = dict(batch=3, width=64, height=48, pixel_format=FourCC.RGB24,
          planes_pos=Planes.MERGED, host_resize=True)


def make_loader():
    return FrameLoader(BUNNY, **KW)


@needs_fixture
def test_items_match_direct_loader():
    from tensor_stream_tpu.utils.torch_data import TorchFrameDataset

    direct = make_loader()
    want = [(idx, np.asarray(t)) for t, idx in
            (next(direct) for _ in range(2))]
    direct.close()

    ds = TorchFrameDataset(make_loader)
    it = iter(ds)
    for want_idx, want_bytes in want:
        t, idx = next(it)
        assert isinstance(t, torch.Tensor)
        assert idx == want_idx
        np.testing.assert_array_equal(t.numpy(), want_bytes)


@needs_fixture
def test_dataloader_passthrough_and_epochs():
    from tensor_stream_tpu.utils.torch_data import TorchFrameDataset

    ds = TorchFrameDataset(make_loader)
    dl = torch.utils.data.DataLoader(ds, batch_size=None, num_workers=0)

    def first_two(iterable):
        out = []
        for t, idx in iterable:
            out.append((list(idx), t.clone()))
            if len(out) == 2:
                break
        return out

    a = first_two(dl)
    b = first_two(dl)  # fresh epoch: the factory re-opens the stream
    assert [i for i, _ in a] == [i for i, _ in b]
    for (_, x), (_, y) in zip(a, b):
        assert torch.equal(x, y)
    assert a[0][1].shape == (3, 48, 64, 3)
    assert a[0][1].dtype == torch.uint8


@needs_fixture
def test_copy_allows_inplace_mutation():
    from tensor_stream_tpu.utils.torch_data import TorchFrameDataset

    ds = TorchFrameDataset(make_loader, copy=True)
    t, _ = next(iter(ds))
    t.add_(1)  # must not raise (detached from the jax buffer)
