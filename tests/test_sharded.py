"""Sharded dataset packing + serving."""
import numpy as np

from polyphemus_tpu.data import BatchLoader
from polyphemus_tpu.data.sharded import ShardedDataset, pack_dataset


def make_sample_dir(tmp_path, n=10, n_bars=2):
    d = tmp_path / "samples"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        c = rng.integers(0, 90, (4, n_bars * 32, 16, 2)).astype(np.int16)
        s = rng.random((4, n_bars * 32)) < 0.2
        np.savez(d / f"s{i:03d}", c_tensor=c, s_tensor=s)
    return str(d)


def test_pack_and_read(tmp_path):
    src = make_sample_dir(tmp_path, n=10)
    out = tmp_path / "shards"
    total = pack_dataset(src, str(out), n_bars=2, shard_size=4)
    assert total == 10
    ds = ShardedDataset(str(out), n_bars=2)
    assert len(ds) == 10

    # content identical to the per-sample dataset
    from polyphemus_tpu.data import PolyphemusDataset

    ref = PolyphemusDataset(src, 2)
    for i in (0, 3, 4, 9):
        t1, m1 = ref[i]
        t2, m2 = ds[i]
        np.testing.assert_array_equal(np.asarray(t1, np.int16), t2)
        np.testing.assert_array_equal(m1, m2)

    loader = BatchLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    toks, mask = next(iter(loader))
    assert toks.shape[0] == 4 and toks.dtype == np.int32
