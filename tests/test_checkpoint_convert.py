"""Torch->flax TransformerNet conversion parity: the flax model with
converted weights must reproduce the torch reference model's output
(drives the fast_neural_style pretrained-checkpoint path on TPU)."""
import os
import sys

import numpy as np
import pytest

REF_FNS = "/root/reference/python_examples/fast_neural_style"


@pytest.mark.skipif(not os.path.exists(os.path.join(REF_FNS, "transfromer_net.py")),
                    reason="reference torch model not available")
@pytest.mark.slow
def test_converted_torch_weights_match_torch_output():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF_FNS)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "python_examples", "fast_neural_style"))
    from transfromer_net import TransformerNet as TorchNet  # reference model
    from convert_torch_checkpoint import convert

    import jax
    from tensor_stream_tpu.models import TransformerNet

    torch.manual_seed(0)
    tnet = TorchNet().eval()
    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = convert(state)

    x = np.random.default_rng(0).uniform(0, 255, (1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        torch_out = tnet(torch.from_numpy(x)).numpy()  # NCHW

    flax_out = TransformerNet().apply(
        jax.tree_util.tree_map(np.asarray, params),
        np.transpose(x, (0, 2, 3, 1)))  # NHWC
    flax_out = np.transpose(np.asarray(flax_out), (0, 3, 1, 2))

    # Outputs are on the 0..255 image scale; XLA and torch accumulate the
    # 20+ convolutions in different orders, so allow ~0.1 intensity noise.
    np.testing.assert_allclose(flax_out, torch_out, atol=0.1)
    assert np.median(np.abs(flax_out - torch_out)) < 1e-2
