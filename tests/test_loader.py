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


def test_epoch_reshuffles():
    ds = _DS(range(64))
    loader = DataLoader(ds, batch_size=8, collate_fn=_collate, shuffle=True,
                        seed=0)
    e0 = [tuple(b) for b in loader]
    e1 = [tuple(b) for b in loader]
    assert e0 != e1
    assert sorted(x for b in e0 for x in b) == sorted(
        x for b in e1 for x in b)
