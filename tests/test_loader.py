"""DataLoader: multi-host stripes are disjoint and cover the dataset;
threaded prefetch yields the same batches as inline."""

from videollm_online_tpu.data.loader import DataLoader


class _DS(list):
    pass


def _collate(xs):
    return xs


def test_process_stripes_disjoint_and_complete():
    ds = _DS(range(100))
    seen = []
    for rank in range(4):
        loader = DataLoader(ds, batch_size=1, collate_fn=_collate,
                            shuffle=True, seed=7, drop_last=False,
                            process_index=rank, process_count=4)
        items = [b[0] for b in loader]
        seen.append(set(items))
    union = set().union(*seen)
    assert union == set(range(100))
    for a in range(4):
        for b in range(a + 1, 4):
            assert not (seen[a] & seen[b])


def test_threaded_matches_inline():
    ds = _DS(range(37))
    inline = [b for b in DataLoader(ds, batch_size=4, collate_fn=_collate,
                                    shuffle=True, seed=3, num_workers=0)]
    threaded = [b for b in DataLoader(ds, batch_size=4, collate_fn=_collate,
                                      shuffle=True, seed=3, num_workers=2)]
    assert inline == threaded


def test_worker_pool_overlaps_slow_getitem():
    """The N-worker pool must hide per-sample cost behind the training step
    (reference uses 16 DataLoader processes, scripts/ego4d/live1+.sh): with a
    40 ms __getitem__ and 4 workers, 8 batches must arrive well under the
    8 * 40 ms serial floor."""
    import time

    class SlowDS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            time.sleep(0.04)
            return i

    loader = DataLoader(SlowDS(), batch_size=1, collate_fn=_collate,
                        shuffle=False, num_workers=4)
    t0 = time.time()
    out = [b[0] for b in loader]
    dt = time.time() - t0
    assert out == list(range(8))
    assert dt < 8 * 0.04 * 0.8, f"no overlap: {dt:.3f}s"


def test_worker_error_propagates():
    class BadDS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise ValueError("boom")
            return i

    import pytest
    loader = DataLoader(BadDS(), batch_size=1, collate_fn=_collate,
                        shuffle=False, num_workers=2)
    with pytest.raises(ValueError, match="boom"):
        list(loader)


def test_epoch_reshuffles():
    ds = _DS(range(64))
    loader = DataLoader(ds, batch_size=8, collate_fn=_collate, shuffle=True,
                        seed=0)
    e0 = [tuple(b) for b in loader]
    e1 = [tuple(b) for b in loader]
    assert e0 != e1
    assert sorted(x for b in e0 for x in b) == sorted(
        x for b in e1 for x in b)
