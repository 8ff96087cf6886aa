"""Loader worker-pool modes + drop_last semantics."""

import numpy as np
import pytest

from tests.fixtures import make_ssv2_fixture
from tests.test_data_pipeline import _cfg


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = tmp_path_factory.mktemp("ssv2")
    make_ssv2_fixture(str(r))
    return str(r)


def _loader(root, **kw):
    """Fresh dataset per loader: the val path draws random spatial jitter
    from the dataset rng (reference semantics), so sharing a dataset between
    two loaders would diverge their streams."""
    from svit_tpu.data import build_dataset
    from svit_tpu.data.loader import Loader, collate_video

    ds = build_dataset("ssv2", _cfg(root, **{"AUG.ENABLE": False}), "val")
    defaults = dict(
        shuffle=False, drop_last=False, num_workers=2,
        collate_fn=collate_video,
    )
    defaults.update(kw)
    return Loader(ds, 2, **defaults)


def test_threaded_loader_matches_inline(root):
    inline = list(_loader(root, num_workers=0))
    threaded = list(_loader(root, num_workers=2))
    assert len(inline) == len(threaded)
    for a, b in zip(inline, threaded):
        np.testing.assert_array_equal(a["index"], b["index"])
        np.testing.assert_allclose(a["clips"], b["clips"])


def test_drop_last(root):
    from svit_tpu.data import build_dataset
    from svit_tpu.data.loader import Loader, collate_video

    ds = build_dataset("ssv2", _cfg(root, **{"AUG.ENABLE": False}), "val")
    keep = Loader(ds, 3, shuffle=False, drop_last=False, num_workers=0,
                  collate_fn=collate_video)
    drop = Loader(ds, 3, shuffle=False, drop_last=True, num_workers=0,
                  collate_fn=collate_video)
    assert len(keep) == 2  # 4 videos / batch 3
    assert len(drop) == 1
    assert sum(1 for _ in keep) == 2
    assert sum(1 for _ in drop) == 1


def test_worker_error_propagates(root):
    loader = _loader(root, num_workers=2)

    class Boom(Exception):
        pass

    def bad_get(idx):
        raise Boom("decode failed")

    loader.dataset = type("DS", (), {
        "__getitem__": staticmethod(bad_get),
        "__len__": staticmethod(lambda: 4),
    })()
    with pytest.raises(Exception):
        list(loader)


def test_iter_batches_resumes_mid_epoch(root):
    full = list(_loader(root, num_workers=0))
    tail = list(_loader(root, num_workers=0).iter_batches(1))
    assert len(tail) == len(full) - 1
    for a, b in zip(full[1:], tail):
        np.testing.assert_array_equal(a["index"], b["index"])
        np.testing.assert_allclose(a["clips"], b["clips"])


def test_process_loader_matches_inline(root):
    """Persistent process workers (dataset pickled once per worker, tasks
    ship only (index, epoch)) must reproduce the inline stream exactly."""
    inline = list(_loader(root, num_workers=0))
    proc = list(_loader(root, num_workers=2, use_processes=True))
    assert len(inline) == len(proc)
    for a, b in zip(inline, proc):
        np.testing.assert_array_equal(a["index"], b["index"])
        np.testing.assert_allclose(a["clips"], b["clips"])


def test_process_loader_sees_set_epoch(root):
    """Workers must apply the loader's epoch (augmentation rng state) even
    though their dataset copy was pickled at pool start."""
    a = _loader(root, num_workers=0)
    b = _loader(root, num_workers=2, use_processes=True)
    a.set_epoch(3)
    b.set_epoch(3)
    for x, y in zip(list(a), list(b)):
        np.testing.assert_allclose(x["clips"], y["clips"])
