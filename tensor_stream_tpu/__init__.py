"""tensor-stream-tpu: a TPU-native video-to-tensor streaming framework.

A ground-up rebuild of the capabilities of osai-ai/tensor-stream for TPU:
RTMP/RTSP/local H.264 streams are demuxed and software-decoded on the TPU
VM host (native C++ runtime), kept in an NV12 ring buffer, and converted
on-device by fused XLA/Pallas programs (crop -> NV12-domain resize ->
color conversion -> normalization -> planar/merged layout) into
device-resident jax.Arrays.

Public API mirrors the reference package (tensor_stream/__init__.py):

    from tensor_stream_tpu import TensorStreamConverter, FourCC, Planes
"""
from .data import (ClipDataset, ClipLoader, FrameLoader, MultiStreamLoader,
                   PooledStreamLoader, ShardedClipDataset,
                   ShardedClipLoader, ShardedStreamLoader)
from .enums import (ColorStandard, FourCC, FrameRate, LogsLevel, LogsType,
                    Planes, ResizeType, StatusLevel)
from .checkpoint import TrainCheckpointer
from .export import export_inference, load_inference
from .serving import StreamInferencer, StreamResult
from .ops.augment import AugmentConfig
from .ops.mix import cutmix, mix_labels, mixup
from .tensor_stream import FrameParameters, TensorStreamConverter
from .video_writer import VideoWriter

__version__ = "0.1.0"

__all__ = [
    "TensorStreamConverter", "FrameParameters", "FrameLoader", "VideoWriter",
    "AugmentConfig", "mixup", "cutmix", "mix_labels", "TrainCheckpointer",
    "export_inference", "load_inference",
    "StreamInferencer", "StreamResult",
    "ClipDataset", "ClipLoader", "MultiStreamLoader", "PooledStreamLoader",
    "ShardedClipDataset", "ShardedClipLoader", "ShardedStreamLoader",
    "StatusLevel", "LogsLevel",
    "LogsType", "FourCC", "ResizeType", "Planes", "FrameRate",
    "ColorStandard",
]
