"""Zero-copy sharded-dataset reader with a native batch-gather kernel.

Shard .npz files (np.savez, STORED zip members) are mmapped once; member
payloads are exposed as numpy views, and per-batch row gathering + int16->
int32 widening runs in the C++ fastloader (polyphemus_tpu/native), falling
back to numpy when no toolchain is available. Implements `gather_batch`, the
fast-path hook BatchLoader prefers over per-sample __getitem__.
"""
from __future__ import annotations

import ast
import ctypes
import json
import mmap
import os
import struct
import zipfile
from typing import List, Tuple

import numpy as np

from ..native import load_fastloader
from .sharded import INDEX_NAME


def _npz_member_views(path: str, members: Tuple[str, ...]):
    """mmap an uncompressed npz and return {name: ndarray view} (zero copy)."""
    f = open(path, "rb")
    mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    views = {}
    with zipfile.ZipFile(f) as zf:
        for info in zf.infolist():
            name = info.filename.removesuffix(".npy")
            if name not in members:
                continue
            if info.compress_type != zipfile.ZIP_STORED:
                raise ValueError(
                    f"{path}:{info.filename} is compressed; fastloader needs "
                    "uncompressed shards (np.savez, not savez_compressed)")
            # local file header: data starts after 30-byte header + name +
            # extra (extra length may differ from the central directory's)
            ho = info.header_offset
            name_len, extra_len = struct.unpack_from("<HH", mm, ho + 26)
            payload = ho + 30 + name_len + extra_len
            # .npy header
            magic = mm[payload:payload + 6]
            if magic != b"\x93NUMPY":
                raise ValueError(f"{path}:{info.filename}: bad npy magic")
            major = mm[payload + 6]
            if major == 1:
                (hlen,) = struct.unpack_from("<H", mm, payload + 8)
                data_off = payload + 10 + hlen
                header = bytes(mm[payload + 10:payload + 10 + hlen])
            else:
                (hlen,) = struct.unpack_from("<I", mm, payload + 8)
                data_off = payload + 12 + hlen
                header = bytes(mm[payload + 12:payload + 12 + hlen])
            meta = ast.literal_eval(header.decode("latin-1").strip())
            dtype = np.dtype(meta["descr"])
            shape = meta["shape"]
            if meta.get("fortran_order"):
                raise ValueError("fortran-order npy not supported")
            count = int(np.prod(shape)) if shape else 1
            arr = np.frombuffer(mm, dtype=dtype, count=count,
                                offset=data_off).reshape(shape)
            views[name] = arr
    return views, mm, f


class FastShardedBatcher:
    """Batch-level reader over a packed shard directory.

    gather_batch(idxs) -> (tokens int32 (B, ...), mask bool (B, ...)).
    """

    def __init__(self, directory: str, n_threads: int = 4):
        with open(os.path.join(directory, INDEX_NAME)) as f:
            self.index = json.load(f)
        self.n_threads = n_threads
        self._lib = load_fastloader()
        self._keepalive: List = []
        self.tok_views: List[np.ndarray] = []
        self.mask_views: List[np.ndarray] = []
        self.offsets: List[int] = []
        off = 0
        for sh in self.index["shards"]:
            views, mm, f = _npz_member_views(
                os.path.join(directory, sh["file"]), ("tokens", "mask"))
            self._keepalive.append((mm, f))
            # The C++ gather kernel hard-codes int16 token rows / 1-byte
            # mask rows; any other dtype would be silently misread into
            # corrupted batches, so fail loudly here instead.
            if views["tokens"].dtype != np.int16:
                raise ValueError(
                    f"{sh['file']}: tokens dtype {views['tokens'].dtype}, "
                    "expected int16 (pack_dataset writes int16; the native "
                    "gather path reads int16 rows)")
            if views["mask"].dtype != np.bool_:
                raise ValueError(
                    f"{sh['file']}: mask dtype {views['mask'].dtype}, "
                    "expected bool")
            self.tok_views.append(views["tokens"])
            self.mask_views.append(views["mask"])
            self.offsets.append(off)
            off += sh["n"]
        self.total = off
        self.sample_tok_shape = self.tok_views[0].shape[1:]
        self.sample_mask_shape = self.mask_views[0].shape[1:]
        self._tok_elems = int(np.prod(self.sample_tok_shape))
        self._mask_bytes = int(np.prod(self.sample_mask_shape))
        if self._lib is not None:
            n = len(self.tok_views)
            self._tok_bases = (ctypes.c_void_p * n)(
                *[v.ctypes.data for v in self.tok_views])
            self._mask_bases = (ctypes.c_void_p * n)(
                *[v.ctypes.data for v in self.mask_views])

    def __len__(self):
        return self.total

    def __getitem__(self, idx: int):
        toks, mask = self.gather_batch(np.asarray([idx]))
        return toks[0], mask[0]

    def gather_batch(self, idxs: np.ndarray):
        idxs = np.asarray(idxs, np.int64)
        shard_ids = np.searchsorted(self.offsets, idxs, side="right") - 1
        row_ids = idxs - np.asarray(self.offsets)[shard_ids]
        b = len(idxs)
        out_t = np.empty((b,) + self.sample_tok_shape, np.int32)
        out_m = np.empty((b,) + self.sample_mask_shape, np.uint8)
        if self._lib is not None:
            sid = np.ascontiguousarray(shard_ids, np.int64)
            rid = np.ascontiguousarray(row_ids, np.int64)
            self._lib.poly_gather_batch(
                sid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                rid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int64(b), self._tok_bases, self._mask_bases,
                ctypes.c_int64(self._tok_elems),
                ctypes.c_int64(self._mask_bytes),
                out_t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                out_m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.c_int32(self.n_threads))
        else:  # numpy fallback, still batch-level on the mmapped views
            for k in range(b):
                out_t[k] = self.tok_views[shard_ids[k]][row_ids[k]]
                out_m[k] = self.mask_views[shard_ids[k]][row_ids[k]].view(
                    np.uint8).reshape(self.sample_mask_shape)
        return out_t, out_m.view(bool)
