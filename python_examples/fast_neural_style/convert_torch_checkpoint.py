"""Convert a fast-neural-style torch checkpoint (.pth) to flax params.

The reference downloads pretrained torch models
(reference: python_examples/fast_neural_style/download_saved_models.py)
and loads them with torch (neural_style.py:46-60). This tool maps those
weights onto the flax TransformerNet so they run on TPU:

    python convert_torch_checkpoint.py mosaic.pth mosaic.msgpack

Layout mapping: torch Conv2d OIHW -> flax HWIO; InstanceNorm
weight/bias -> scale/bias; deprecated running_* keys are dropped exactly
like the reference loader.
"""
import re
import sys

import numpy as np


# torch module name -> (flax module path). Order follows TransformerNet
# (reference: transfromer_net.py:4-41; ours: models/transformer_net.py).
_CONV_MAP = {
    "conv1.conv2d": "ConvLayer_0/Conv_0",
    "conv2.conv2d": "ConvLayer_1/Conv_0",
    "conv3.conv2d": "ConvLayer_2/Conv_0",
    "res1.conv1.conv2d": "ResidualBlock_0/ConvLayer_0/Conv_0",
    "res1.conv2.conv2d": "ResidualBlock_0/ConvLayer_1/Conv_0",
    "res2.conv1.conv2d": "ResidualBlock_1/ConvLayer_0/Conv_0",
    "res2.conv2.conv2d": "ResidualBlock_1/ConvLayer_1/Conv_0",
    "res3.conv1.conv2d": "ResidualBlock_2/ConvLayer_0/Conv_0",
    "res3.conv2.conv2d": "ResidualBlock_2/ConvLayer_1/Conv_0",
    "res4.conv1.conv2d": "ResidualBlock_3/ConvLayer_0/Conv_0",
    "res4.conv2.conv2d": "ResidualBlock_3/ConvLayer_1/Conv_0",
    "res5.conv1.conv2d": "ResidualBlock_4/ConvLayer_0/Conv_0",
    "res5.conv2.conv2d": "ResidualBlock_4/ConvLayer_1/Conv_0",
    "deconv1.conv2d": "UpsampleConvLayer_0/Conv_0",
    "deconv2.conv2d": "UpsampleConvLayer_1/Conv_0",
    "deconv3.conv2d": "ConvLayer_3/Conv_0",
}

_IN_MAP = {
    "in1": "InstanceNorm_0",
    "in2": "InstanceNorm_1",
    "in3": "InstanceNorm_2",
    "res1.in1": "ResidualBlock_0/InstanceNorm_0",
    "res1.in2": "ResidualBlock_0/InstanceNorm_1",
    "res2.in1": "ResidualBlock_1/InstanceNorm_0",
    "res2.in2": "ResidualBlock_1/InstanceNorm_1",
    "res3.in1": "ResidualBlock_2/InstanceNorm_0",
    "res3.in2": "ResidualBlock_2/InstanceNorm_1",
    "res4.in1": "ResidualBlock_3/InstanceNorm_0",
    "res4.in2": "ResidualBlock_3/InstanceNorm_1",
    "res5.in1": "ResidualBlock_4/InstanceNorm_0",
    "res5.in2": "ResidualBlock_4/InstanceNorm_1",
    "in4": "InstanceNorm_3",
    "in5": "InstanceNorm_4",
}


def _set(tree, path, value):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert(state_dict):
    """Maps a torch TransformerNet state_dict to a flax params pytree."""
    params = {}
    for k in list(state_dict):
        if re.search(r"in\d+\.running_(mean|var)$", k):
            del state_dict[k]  # like the reference loader
    for torch_name, flax_path in _CONV_MAP.items():
        w = np.asarray(state_dict[f"{torch_name}.weight"])
        b = np.asarray(state_dict[f"{torch_name}.bias"])
        _set(params, f"{flax_path}/kernel", w.transpose(2, 3, 1, 0))  # OIHW->HWIO
        _set(params, f"{flax_path}/bias", b)
    for torch_name, flax_path in _IN_MAP.items():
        _set(params, f"{flax_path}/scale", np.asarray(state_dict[f"{torch_name}.weight"]))
        _set(params, f"{flax_path}/bias", np.asarray(state_dict[f"{torch_name}.bias"]))
    return {"params": params}


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    import torch
    import flax.serialization

    state_dict = torch.load(sys.argv[1], map_location="cpu")
    params = convert({k: v.numpy() for k, v in state_dict.items()})
    with open(sys.argv[2], "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    print(f"wrote {sys.argv[2]}")


if __name__ == "__main__":
    main()
