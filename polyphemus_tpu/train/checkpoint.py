"""Checkpointing with resume.

Keeps the reference's two-name scheme — rolling `checkpoint` + `best_model`
on validation improvement (/root/reference/training.py:218-233, :498-519) —
and adds what the reference lacks: an actual --resume path (train.py has
none even though optimizer state is saved; SURVEY.md §5).

Format: a directory containing
  <name>.msgpack   flax-serialized {params, batch_stats, opt_state}
  <name>.json      step counters, stats histories, config
"""
from __future__ import annotations

import json
import os
import queue
import threading
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_checkpoint(model_dir: str, name: str, state_tree: Any,
                    meta: dict) -> None:
    state_tree = jax.device_get(state_tree)
    write_checkpoint(model_dir, name, serialization.to_bytes(state_tree),
                     meta)


def write_checkpoint(model_dir: str, name: str, state_bytes: bytes,
                     meta: dict) -> None:
    """Atomically write pre-serialized state bytes + meta json."""
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, name + ".msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(state_bytes)
    os.replace(tmp, path)
    meta_path = os.path.join(model_dir, name + ".json")
    meta_tmp = meta_path + ".tmp"
    with open(meta_tmp, "w") as f:
        json.dump(_jsonable(meta), f)
    os.replace(meta_tmp, meta_path)


class AsyncSaver:
    """Background checkpoint writer.

    A flagship-shape checkpoint is ~500 MB: on the tunneled TPU the
    blocking cost is ~11 s device->host transfer + ~17 s msgpack encode +
    write, per name — measured round 4, PERFORMANCE.md. Saving twice per
    eval boundary (best_model + checkpoint) froze the sustained run for
    up to a minute. Instead the trainer hands us an on-device snapshot
    (fresh buffers, so the train step's donation of the live state can't
    invalidate them), we enqueue the device->host DMA immediately
    (`copy_to_host_async`), and a worker thread drains the transfer,
    encodes, and writes while training keeps dispatching steps.

    Orderly FIFO (single worker thread), at most `max_pending` snapshots
    in flight so queued saves can't pile up HBM copies. Worker errors are
    re-raised on the next submit()/wait().
    """

    def __init__(self, max_pending: int = 2):
        self._q: queue.Queue = queue.Queue()
        self._pending = threading.Semaphore(max_pending)
        self._exc: Exception | None = None
        self._thread: threading.Thread | None = None

    def submit(self, snapshot: Any, model_dir: str, name: str,
               meta: dict) -> None:
        self._raise_pending()
        # start the DMA now, on the caller thread, so the device->host
        # copy overlaps the very next train step
        for leaf in jax.tree_util.tree_leaves(snapshot):
            if isinstance(leaf, jax.Array):
                try:
                    leaf.copy_to_host_async()
                except Exception:
                    pass  # backend without async copies: worker blocks
        self._pending.acquire()  # bound in-flight snapshots (HBM copies)
        if self._thread is None:
            self._thread = threading.Thread(target=self._worker,
                                            daemon=True)
            self._thread.start()
        self._q.put((snapshot, model_dir, name, meta))

    def wait(self) -> None:
        """Block until every submitted save is on disk, then re-raise any
        worker error."""
        self._q.join()
        self._raise_pending()

    def _worker(self) -> None:
        while True:
            snapshot, model_dir, name, meta = self._q.get()
            try:
                host = jax.device_get(snapshot)
                del snapshot  # release the device copy before encoding
                write_checkpoint(model_dir, name,
                                 serialization.to_bytes(host), meta)
            except Exception as e:  # noqa: BLE001 - re-raised on wait
                self._exc = e
            finally:
                self._pending.release()
                self._q.task_done()

    def _raise_pending(self) -> None:
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise RuntimeError("async checkpoint save failed") from exc


def load_checkpoint(model_dir: str, name: str, state_template: Any):
    path = os.path.join(model_dir, name + ".msgpack")
    with open(path, "rb") as f:
        state = serialization.from_bytes(state_template, f.read())
    meta_path = os.path.join(model_dir, name + ".json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def latest_exists(model_dir: str, name: str = "checkpoint") -> bool:
    return os.path.exists(os.path.join(model_dir, name + ".msgpack"))


def _jsonable(x):
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, (np.generic,)):
        return x.item()
    if isinstance(x, np.ndarray):
        return x.tolist()
    if hasattr(x, "item") and getattr(x, "ndim", None) == 0:
        return x.item()
    return x
