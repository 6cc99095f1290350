"""Native fastloader vs the plain sharded reader, plus throughput sanity."""
import time

import numpy as np
import pytest

from polyphemus_tpu.data import BatchLoader
from polyphemus_tpu.data.fastloader import FastShardedBatcher
from polyphemus_tpu.data.sharded import ShardedDataset, pack_dataset
from polyphemus_tpu.native import load_fastloader

from .test_sharded import make_sample_dir


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fast")
    src = make_sample_dir(tmp, n=32)
    out = tmp / "shards"
    pack_dataset(src, str(out), n_bars=2, shard_size=10)
    return str(out)


def test_native_lib_compiles():
    lib = load_fastloader()
    assert lib is not None, "g++ toolchain present; fastloader must build"


def test_fast_matches_plain(shard_dir):
    fast = FastShardedBatcher(shard_dir, n_threads=2)
    plain = ShardedDataset(shard_dir)
    assert len(fast) == len(plain) == 32
    idxs = np.asarray([0, 5, 9, 10, 25, 31])
    toks, mask = fast.gather_batch(idxs)
    assert toks.dtype == np.int32 and mask.dtype == bool
    for k, i in enumerate(idxs):
        t, m = plain[int(i)]
        np.testing.assert_array_equal(toks[k], t.astype(np.int32))
        np.testing.assert_array_equal(mask[k], m)


def test_batchloader_uses_fast_path(shard_dir):
    fast = FastShardedBatcher(shard_dir)
    loader = BatchLoader(fast, batch_size=8, shuffle=True, num_workers=1)
    batches = list(iter(loader))
    assert len(batches) == 4
    toks, mask = batches[0]
    assert toks.shape[0] == 8 and toks.dtype == np.int32


def test_fast_throughput(shard_dir):
    fast = FastShardedBatcher(shard_dir, n_threads=2)
    idxs = np.arange(32)
    fast.gather_batch(idxs)  # warm page cache
    t0 = time.perf_counter()
    for _ in range(50):
        fast.gather_batch(idxs)
    dt = time.perf_counter() - t0
    rate = 50 * 32 / dt
    # generous sanity bound; native path does ~1e5+/s even on 1 core
    assert rate > 5000, f"gather too slow: {rate:.0f} samples/s"
