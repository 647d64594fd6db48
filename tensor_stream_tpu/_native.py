"""ctypes bindings to libtsingest.so (the native ingest runtime).

The reference bound C++ to Python with pybind11 + LibTorch
(reference: src/Wrappers/WrapperPython.cpp:458-524). Here the native
library exposes a plain C ABI and Python talks to it through ctypes,
which releases the GIL for every call — the consumer GetFrame and the
producer loop overlap exactly like the reference's
py::gil_scoped_release'd start/get.
"""
import ctypes
import os
import subprocess
import threading

_LIB = None
_LIB_LOCK = threading.Lock()

# Status codes (csrc/ts_common.h).
TS_OK = 0
TS_REPEAT = -1
TS_UNSUPPORTED = -2
TS_ERROR = -3
TS_EOF = -4
TS_FINISHED = -5
TS_TIMEOUT = -6
# Mid-stream geometry switch: re-query dims via ts_pipeline_ack_renegotiate
# and resize consumer buffers before retrying the read.
TS_RENEGOTIATE = -8


def _lib_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")


def _build_if_needed(lib_path: str) -> None:
    srcs = [os.path.join(_lib_dir(), f) for f in os.listdir(_lib_dir())
            if f.endswith((".cpp", ".h"))]
    if os.path.exists(lib_path):
        lib_mtime = os.path.getmtime(lib_path)
        if all(os.path.getmtime(s) <= lib_mtime for s in srcs):
            return
    subprocess.run(["make", "-C", _lib_dir()], check=True, capture_output=True)


def load():
    """Loads (building if stale) and configures the native library."""
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        lib_path = os.path.join(_lib_dir(), "libtsingest.so")
        _build_if_needed(lib_path)
        lib = ctypes.CDLL(lib_path)

        c_void_p, c_char_p, c_int, c_uint = (
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_uint)

        def sig(name, restype, argtypes):
            fn = getattr(lib, name)
            fn.restype = restype
            fn.argtypes = argtypes

        sig("ts_pipeline_create", c_void_p, [])
        sig("ts_pipeline_init", c_int,
            [c_void_p, c_char_p, c_int, c_int, c_int, c_int, c_int])
        sig("ts_pipeline_init_ex", c_int,
            [c_void_p, c_char_p, c_int, c_int, c_int, c_int, c_int, c_int,
             c_int])
        sig("ts_pipeline_init_ex2", c_int,
            [c_void_p, c_char_p, c_int, c_int, c_int, c_int, c_int, c_int,
             c_int, c_int, c_int, c_int])
        sig("ts_pipeline_seek_frame", c_int, [c_void_p, ctypes.c_longlong])
        sig("ts_pipeline_set_format_option", None,
            [c_void_p, c_char_p, c_char_p])
        sig("ts_pipeline_start", c_int, [c_void_p])
        sig("ts_pipeline_step", c_int, [c_void_p])
        sig("ts_pipeline_get", c_int,
            [c_void_p, c_char_p, c_int, c_void_p, c_void_p])
        sig("ts_pipeline_try_get", c_int,
            [c_void_p, c_char_p, c_int, c_void_p, c_void_p])
        sig("ts_pipeline_get_batch", c_int,
            [c_void_p, c_char_p, c_int, c_void_p, c_void_p,
             ctypes.POINTER(ctypes.c_int)])
        sig("ts_pipeline_register_cursor", None, [c_void_p, c_char_p])
        sig("ts_pipeline_get_series", c_int,
            [c_void_p, c_char_p, c_int, c_int, c_void_p, c_void_p,
             ctypes.POINTER(ctypes.c_int)])
        sig("ts_pipeline_get_batch_resized", c_int,
            [c_void_p, c_char_p, c_int, c_int, c_int, c_int, c_void_p,
             c_void_p, ctypes.POINTER(ctypes.c_int)])
        # GOP/segment-parallel reader (seekable files; csrc/segment_reader.h)
        sig("ts_segmented_create", c_void_p,
            [c_char_p, c_int, c_int, c_int, c_int, c_int, c_int, c_int,
             c_int, c_int])
        sig("ts_segmented_start", c_int, [c_void_p])
        sig("ts_segmented_get_batch", c_int,
            [c_void_p, c_int, c_void_p, c_void_p,
             ctypes.POINTER(ctypes.c_int)])
        sig("ts_segmented_width", c_int, [c_void_p])
        sig("ts_segmented_height", c_int, [c_void_p])
        sig("ts_segmented_out_width", c_int, [c_void_p])
        sig("ts_segmented_out_height", c_int, [c_void_p])
        sig("ts_segmented_total_frames", ctypes.c_longlong, [c_void_p])
        sig("ts_segmented_chunks", c_int, [c_void_p])
        sig("ts_segmented_frames_deposited", ctypes.c_longlong, [c_void_p])
        sig("ts_segmented_seek_frame", None, [c_void_p, ctypes.c_longlong])
        sig("ts_segmented_stop", None, [c_void_p])
        sig("ts_segmented_destroy", None, [c_void_p])
        # Random-access clip reader (seekable files; csrc/clip_reader.h)
        sig("ts_clip_create", c_void_p,
            [c_char_p, c_int, c_int, c_int, c_int, c_int, c_int])
        sig("ts_clip_get_batch", c_int,
            [c_void_p, ctypes.POINTER(ctypes.c_longlong), c_int, c_int,
             c_int, c_void_p, c_void_p])
        sig("ts_clip_width", c_int, [c_void_p])
        sig("ts_clip_height", c_int, [c_void_p])
        sig("ts_clip_out_width", c_int, [c_void_p])
        sig("ts_clip_out_height", c_int, [c_void_p])
        sig("ts_clip_total_frames", ctypes.c_longlong, [c_void_p])
        sig("ts_clip_segments", c_int, [c_void_p])
        sig("ts_clip_segment_table", c_int,
            [c_void_p, ctypes.POINTER(ctypes.c_longlong), c_int])
        sig("ts_clip_frames_decoded", ctypes.c_longlong, [c_void_p])
        sig("ts_clip_release_decoders", None, [c_void_p])
        sig("ts_clip_destroy", None, [c_void_p])
        sig("ts_writer_create", c_void_p,
            [c_char_p, c_int, c_int, c_int, c_int, c_char_p, c_int])
        sig("ts_writer_write_rgb", c_int, [c_void_p, c_void_p])
        sig("ts_writer_write_nv12", c_int, [c_void_p, c_void_p, c_void_p])
        sig("ts_writer_frames", ctypes.c_longlong, [c_void_p])
        sig("ts_writer_close", c_int, [c_void_p])
        sig("ts_writer_destroy", None, [c_void_p])
        sig("ts_resize_nv12_host", None,
            [c_void_p, c_void_p, c_int, c_int, c_void_p, c_void_p, c_int,
             c_int, c_int])
        sig("ts_host_simd_available", c_int, [])
        sig("ts_pipeline_ack_renegotiate", c_int,
            [c_void_p, c_char_p, ctypes.POINTER(ctypes.c_int),
             ctypes.POINTER(ctypes.c_int)])
        sig("ts_pipeline_consumer_dims", None,
            [c_void_p, c_char_p, ctypes.POINTER(ctypes.c_int),
             ctypes.POINTER(ctypes.c_int)])
        sig("ts_pipeline_detected_standard", c_int, [c_void_p])
        sig("ts_vpp_convert_host", c_int,
            [c_void_p, c_void_p, c_int, c_int, c_int, c_int, c_int, c_int,
             c_int, c_int, c_int, c_int, c_int, c_int, c_int, c_void_p])
        sig("ts_vpp_output_elements", ctypes.c_longlong,
            [c_int, c_int, c_int])
        sig("ts_vpp_is_float", c_int, [c_int, c_int])
        sig("ts_vpp_output_size", None,
            [c_int, c_int, c_int, c_int, c_int, c_int, c_int, c_int,
             ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)])
        sig("ts_pipeline_get_converted", c_int,
            [c_void_p, c_char_p, c_int, c_int, c_int, c_int, c_int, c_int,
             c_int, c_int, c_int, c_int, c_int, c_int, c_void_p])
        sig("ts_pool_create", c_void_p, [c_int])
        sig("ts_pool_add_stream", c_int, [c_void_p, c_char_p, c_int, c_int, c_int])
        sig("ts_pool_start", c_int, [c_void_p])
        sig("ts_pool_stream", c_void_p, [c_void_p, c_int])
        sig("ts_pool_stop", None, [c_void_p])
        sig("ts_pool_destroy", None, [c_void_p])
        sig("ts_pipeline_stop", None, [c_void_p])
        sig("ts_pipeline_destroy", None, [c_void_p])
        for name in ("width", "height", "fps_num", "fps_den", "delay_ms",
                     "frame_index", "analyze_errors", "keeps_buffer",
                     "slept_ms", "reconnect_count"):
            sig(f"ts_pipeline_{name}", c_int, [c_void_p])
        sig("ts_pipeline_stat_ns", ctypes.c_longlong, [c_void_p, c_int])
        sig("ts_pipeline_skip_analyze", None, [c_void_p])
        sig("ts_pipeline_enable_logs", None, [c_void_p, c_int])
        sig("ts_pipeline_enable_trace", None, [c_void_p])
        sig("ts_set_timeout_ms", None, [c_int])
        sig("ts_get_timeout_ms", c_int, [])

        sig("ts_bitreader_create", c_void_p, [c_char_p, c_int])
        sig("ts_bitreader_destroy", None, [c_void_p])
        sig("ts_bitreader_read_bits", c_uint, [c_void_p, c_int])
        sig("ts_bitreader_skip_bits", c_int, [c_void_p, c_int])
        sig("ts_bitreader_read_golomb", c_uint, [c_void_p])
        sig("ts_bitreader_read_sgolomb", c_int, [c_void_p])
        sig("ts_bitreader_skip_golomb", c_int, [c_void_p])
        sig("ts_bitreader_find_nal_type", c_uint, [c_void_p])
        sig("ts_bitreader_byte_index", c_int, [c_void_p])
        sig("ts_bitreader_shift_in_bits", c_int, [c_void_p])

        sig("ts_hevc_analyzer_create", c_void_p, [])
        sig("ts_hevc_analyzer_destroy", None, [c_void_p])
        sig("ts_hevc_analyzer_analyze", c_int, [c_void_p, c_char_p, c_int])
        sig("ts_analyzer_create", c_void_p, [])
        sig("ts_analyzer_destroy", None, [c_void_p])
        sig("ts_analyzer_analyze", c_int, [c_void_p, c_char_p, c_int])
        sig("ts_vp9_analyzer_create", c_void_p, [])
        sig("ts_vp9_analyzer_destroy", None, [c_void_p])
        sig("ts_vp9_analyzer_analyze", c_int, [c_void_p, c_char_p, c_int])
        sig("ts_av1_analyzer_create", c_void_p, [])
        sig("ts_av1_analyzer_destroy", None, [c_void_p])
        sig("ts_av1_analyzer_analyze", c_int, [c_void_p, c_char_p, c_int])

        sig("ts_parser_create", c_void_p, [])
        sig("ts_parser_destroy", None, [c_void_p])
        sig("ts_parser_init", c_int, [c_void_p, c_char_p, c_int, c_int])
        sig("ts_parser_width", c_int, [c_void_p])
        sig("ts_parser_height", c_int, [c_void_p])
        sig("ts_parser_fps_num", c_int, [c_void_p])
        sig("ts_parser_fps_den", c_int, [c_void_p])
        sig("ts_parser_next_packet", c_int,
            [c_void_p, c_void_p, c_int,
             ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_longlong)])
        sig("ts_parser_analyze_last", c_int, [c_void_p])

        _LIB = lib
        return _LIB
