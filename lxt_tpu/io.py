"""Checkpoint IO: native safetensors loading without torch.

The reference's weight path is ``AutoModel.from_pretrained`` (torch CPU
tensors). Here HF safetensors checkpoints are read by a small C++ library
(``native/safeload.cpp``: mmap, zero-copy views, threaded bf16/f16->f32
widening) bound via ctypes, feeding the per-family converters directly —
no torch in the serving path.

    params = load_checkpoint_params("/path/to/llama-dir", cfg, jllama.params_from_hf)

Falls back to a pure-numpy reader if the native library can't be built.
"""

import ctypes
import json
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_NATIVE_DIR = Path(__file__).parent / "native"

_DTYPES = {
    "F32": (np.float32, 4), "F16": (np.float16, 2), "BF16": (None, 2),
    "I64": (np.int64, 8), "I32": (np.int32, 4), "I16": (np.int16, 2),
    "I8": (np.int8, 1), "U8": (np.uint8, 1), "BOOL": (np.bool_, 1),
    "F64": (np.float64, 8),
}


def _build_native():
    src = _NATIVE_DIR / "safeload.cpp"
    so = _NATIVE_DIR / "libsafeload.so"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
         str(src), "-o", str(so)],
        check=True, capture_output=True)
    return so


def _lib():
    global _LIB
    if _LIB is None:
        so = _build_native()
        lib = ctypes.CDLL(str(so))
        lib.sl_open.restype = ctypes.c_void_p
        lib.sl_open.argtypes = [ctypes.c_char_p]
        lib.sl_header_len.restype = ctypes.c_uint64
        lib.sl_header_len.argtypes = [ctypes.c_void_p]
        lib.sl_header.restype = ctypes.c_void_p
        lib.sl_header.argtypes = [ctypes.c_void_p]
        lib.sl_data.restype = ctypes.c_void_p
        lib.sl_data.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.sl_file_size.restype = ctypes.c_uint64
        lib.sl_file_size.argtypes = [ctypes.c_void_p]
        lib.sl_widen.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_uint64, ctypes.c_int, ctypes.c_int]
        lib.sl_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def _itemsize(st_dtype):
    return 2 if st_dtype in ("BF16", "F16") else _DTYPES[st_dtype][1]


def _validate_tensor(name, st_dtype, shape, begin, end, data_size):
    """Bounds-check one tensor record against the container's data section
    (a truncated/malformed file must raise, not read out of bounds)."""
    count = int(np.prod(shape)) if shape else 1
    if begin < 0 or end < begin or end > data_size:
        raise ValueError(
            f"safetensors tensor '{name}': data_offsets [{begin}, {end}) "
            f"outside the {data_size}-byte data section")
    if end - begin != count * _itemsize(st_dtype):
        raise ValueError(
            f"safetensors tensor '{name}': {end - begin} bytes for "
            f"{count} x {st_dtype} elements")
    return count


def _widen_np(raw_u16, kind):
    """bf16/f16 -> f32 in pure numpy (fallback when g++ is unavailable)."""
    if kind == 0:  # bf16: shift into the top half of an f32
        return (raw_u16.astype(np.uint32) << 16).view(np.float32)
    return raw_u16.view(np.float16).astype(np.float32)


def _parse_entries(meta):
    meta = dict(meta)
    meta.pop("__metadata__", None)
    return meta


def _load_safetensors_native(path, dtype, threads, lib):
    threads = threads or min(8, os.cpu_count() or 1)
    handle = lib.sl_open(str(path).encode())
    if not handle:
        # distinguish "no such checkpoint" (callers branch on this to try
        # alternate paths) from "file exists but is truncated/malformed"
        if not os.path.exists(path):
            raise FileNotFoundError(f"{path}: no such safetensors file")
        raise ValueError(f"{path}: truncated or malformed safetensors")
    try:
        hlen = lib.sl_header_len(handle)
        data_size = lib.sl_file_size(handle) - 8 - hlen
        header = ctypes.string_at(lib.sl_header(handle), hlen)
        meta = _parse_entries(json.loads(header))

        out = {}
        for name, info in meta.items():
            st_dtype = info["dtype"]
            shape = tuple(info["shape"])
            begin, end = info["data_offsets"]
            count = _validate_tensor(name, st_dtype, shape, begin, end,
                                     data_size)
            ptr = lib.sl_data(handle, begin)
            nbytes = end - begin

            if st_dtype in ("BF16", "F16"):
                dst = np.empty(count, np.float32)
                kind = 0 if st_dtype == "BF16" else 1
                lib.sl_widen(ptr, dst.ctypes.data_as(ctypes.c_void_p),
                             count, kind, threads)
                arr = dst.reshape(shape).astype(dtype, copy=False)
            else:
                np_dtype, _ = _DTYPES[st_dtype]
                buf = (ctypes.c_char * nbytes).from_address(ptr)
                arr = np.frombuffer(buf, dtype=np_dtype).reshape(shape)
                arr = np.array(arr)  # own the memory before handle close
            out[name] = arr
        return out
    finally:
        lib.sl_close(handle)


def _load_safetensors_numpy(path, dtype):
    """Pure-numpy reader (no native library): np.memmap + vectorized
    bf16/f16 widening. Same validation and output contract as the native
    path, ~4x slower on bf16 checkpoints."""
    mm = np.memmap(path, np.uint8, mode="r")
    if mm.size < 8:
        raise ValueError(f"{path}: truncated safetensors (< 8 bytes)")
    hlen = int(np.frombuffer(mm[:8], np.uint64)[0])
    if hlen > mm.size - 8:
        raise ValueError(f"{path}: header length {hlen} past end of file")
    meta = _parse_entries(json.loads(bytes(mm[8:8 + hlen])))
    data = mm[8 + hlen:]

    out = {}
    for name, info in meta.items():
        st_dtype = info["dtype"]
        shape = tuple(info["shape"])
        begin, end = info["data_offsets"]
        _validate_tensor(name, st_dtype, shape, begin, end, data.size)
        raw = data[begin:end]
        if st_dtype in ("BF16", "F16"):
            kind = 0 if st_dtype == "BF16" else 1
            arr = _widen_np(raw.view(np.uint16), kind).reshape(shape)
            arr = arr.astype(dtype, copy=False)
        else:
            np_dtype, _ = _DTYPES[st_dtype]
            arr = np.array(raw.view(np_dtype).reshape(shape))
        out[name] = arr
    return out


def load_safetensors(path, dtype=np.float32, threads=None):
    """Read one .safetensors file -> {name: np.ndarray}.

    f32/int tensors are zero-copy views onto the mmap (copied only on
    mutation); bf16/f16 tensors are widened to ``dtype`` by the native
    thread pool. Falls back to the pure-numpy reader if the native library
    cannot be built (no g++) or loaded.
    """
    try:
        lib = _lib()
    except (OSError, subprocess.CalledProcessError):
        # failure to BUILD/LOAD the native library falls back outright
        return _load_safetensors_numpy(path, dtype)
    try:
        return _load_safetensors_native(path, dtype, threads, lib)
    except ValueError:
        # the native reader can reject an EXISTING file for reasons beyond
        # corruption (e.g. an mmap-hostile filesystem failing sl_open) —
        # give the pure-numpy reader a try; a genuinely truncated/malformed
        # checkpoint raises the same ValueError from it
        return _load_safetensors_numpy(path, dtype)


def load_checkpoint_state_dict(model_dir, dtype=np.float32):
    """Load an HF checkpoint directory (single- or multi-shard safetensors)
    into a flat {name: np.ndarray} dict."""
    model_dir = Path(model_dir)
    index = model_dir / "model.safetensors.index.json"
    if index.exists():
        shards = sorted(set(json.loads(index.read_text())["weight_map"].values()))
        state = {}
        for shard in shards:
            state.update(load_safetensors(model_dir / shard, dtype=dtype))
        return state
    single = model_dir / "model.safetensors"
    if single.exists():
        return load_safetensors(single, dtype=dtype)
    raise FileNotFoundError(f"no safetensors checkpoint in {model_dir}")


def load_checkpoint_params(model_dir, cfg, converter, dtype=np.float32):
    """End-to-end: checkpoint dir -> model param pytree via a family
    converter (e.g. ``lxt_tpu.models.llama.params_from_hf``)."""
    state = load_checkpoint_state_dict(model_dir, dtype=dtype)
    return converter(state, cfg, dtype=dtype)
