"""Batcher.iter_from: the exact-resume fast-forward contract in isolation
(the end-to-end version lives in test_loop.py::test_resume_restores_exact_state)."""

import numpy as np

from apv_tpu.data import Batcher


def _stream(batcher, n):
    out = []
    it = iter(batcher)
    for _ in range(n):
        out.append(next(it)["x"].copy())
    return out


def test_iter_from_matches_uninterrupted_stream():
    arrays = {"x": np.arange(100, dtype=np.float32)}
    full = _stream(Batcher(arrays, 16, seed=3), 20)       # > 3 epochs

    for start in (0, 1, 5, 6, 7, 13):                     # incl. epoch edges
        b2 = Batcher(arrays, 16, seed=3)
        it = b2.iter_from(start)
        for i in range(start, 20):
            np.testing.assert_array_equal(next(it)["x"], full[i],
                                          err_msg=f"start={start} batch={i}")


def test_iter_from_zero_is_plain_iteration():
    arrays = {"x": np.arange(64, dtype=np.float32)}
    a = _stream(Batcher(arrays, 16, seed=0), 8)
    b2 = Batcher(arrays, 16, seed=0)
    it = b2.iter_from(0)
    for i in range(8):
        np.testing.assert_array_equal(next(it)["x"], a[i])


def test_iter_from_unshuffled():
    arrays = {"x": np.arange(64, dtype=np.float32)}
    b = Batcher(arrays, 16, shuffle=False)
    it = b.iter_from(5)           # epoch has 4 batches; 5 -> epoch 1, batch 1
    np.testing.assert_array_equal(next(it)["x"],
                                  np.arange(16, 32, dtype=np.float32))
