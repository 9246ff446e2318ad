"""ctypes binding for the native token-packing buffer (token_buffer.cpp).

Compiled lazily with g++ into a per-user cache; falls back cleanly when no
compiler is available (callers check `native_available()`).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "token_buffer.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_lib():
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "lwm_tpu",
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"token_buffer_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)
    lib.tb_create.restype = ctypes.c_void_p
    lib.tb_destroy.argtypes = [ctypes.c_void_p]
    lib.tb_append.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    lib.tb_size.argtypes = [ctypes.c_void_p]
    lib.tb_size.restype = ctypes.c_int64
    lib.tb_emit.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.tb_emit.restype = ctypes.c_int32
    lib.tb_clear.argtypes = [ctypes.c_void_p]
    return lib


def _get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            try:
                _LIB = _build_lib()
            except Exception:
                _LIB = None
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


class NativeTokenBuffer:
    """Contiguous token/mask/vision-mask stream with O(1) batch emission."""

    def __init__(self):
        self._lib = _get_lib()
        if self._lib is None:
            raise RuntimeError("native token buffer unavailable (no g++?)")
        self._handle = self._lib.tb_create()

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.tb_destroy(self._handle)
            self._handle = None

    def __len__(self):
        return int(self._lib.tb_size(self._handle))

    def append(self, tokens, masks, vision=None):
        tokens = np.ascontiguousarray(tokens, dtype=np.int32)
        masks = np.ascontiguousarray(masks, dtype=np.float32)
        assert tokens.shape == masks.shape
        vis_ptr = None
        if vision is not None:
            vision = np.ascontiguousarray(vision, dtype=np.uint8)
            assert vision.shape == tokens.shape
            vis_ptr = vision.ctypes.data_as(ctypes.c_void_p)
        self._lib.tb_append(
            self._handle,
            tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            masks.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            vis_ptr,
            tokens.size,
        )

    def emit(self, batch_size, seq_length, with_vision=False):
        """Return a packed batch dict or None if underfull. Consumes
        batch_size*seq_length tokens on success."""
        chunk = batch_size * seq_length
        input_tokens = np.empty(chunk, np.int32)
        target_tokens = np.empty(chunk, np.int32)
        loss_masks = np.empty(chunk, np.float32)
        in_vis = np.empty(chunk, np.uint8) if with_vision else None
        tg_vis = np.empty(chunk, np.uint8) if with_vision else None
        ok = self._lib.tb_emit(
            self._handle,
            chunk,
            input_tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            target_tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            loss_masks.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            in_vis.ctypes.data_as(ctypes.c_void_p) if with_vision else None,
            tg_vis.ctypes.data_as(ctypes.c_void_p) if with_vision else None,
        )
        if not ok:
            return None
        batch = {
            "input_tokens": input_tokens.reshape(batch_size, seq_length),
            "target_tokens": target_tokens.reshape(batch_size, seq_length),
            "loss_masks": loss_masks.reshape(batch_size, seq_length),
        }
        if with_vision:
            batch["input_vision_masks"] = in_vis.reshape(batch_size, seq_length).astype(bool)
            batch["target_vision_masks"] = tg_vis.reshape(batch_size, seq_length).astype(bool)
        return batch

    def clear(self):
        self._lib.tb_clear(self._handle)
