"""Native C++ host-data library vs the numpy implementations
(native/mcdata.cc via modelcompose_tpu/utils/native.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from modelcompose_tpu.utils.native import (fbank_native, fps_native,
                                           knn_native, native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="libmcdata.so not built")


def test_fbank_native_matches_numpy():
    from modelcompose_tpu.data.audio_processing import kaldi_fbank
    wav = (np.random.RandomState(0).randn(16000) * (2 ** 15)
           ).astype(np.float32)
    native = fbank_native(wav)
    ref = kaldi_fbank(wav, use_native=False)
    assert native.shape == ref.shape == (98, 128)
    np.testing.assert_allclose(native, ref, atol=2e-3, rtol=1e-3)


def test_fbank_native_short_input():
    out = fbank_native(np.zeros(10, np.float32))
    assert out.shape == (0, 128)


def test_fps_native_matches_jax():
    from modelcompose_tpu.models.point_bert import farthest_point_sample
    xyz = np.random.RandomState(1).randn(128, 3).astype(np.float32)
    native = fps_native(xyz, 16)
    ref = np.asarray(farthest_point_sample(jnp.asarray(xyz[None]), 16))[0]
    np.testing.assert_array_equal(native, ref)


def test_knn_native_matches_jax():
    from modelcompose_tpu.models.point_bert import knn_point
    rs = np.random.RandomState(2)
    xyz = rs.randn(64, 3).astype(np.float32)
    centers = rs.randn(8, 3).astype(np.float32)
    native = knn_native(xyz, centers, 4)
    ref = np.asarray(knn_point(4, jnp.asarray(xyz[None]),
                               jnp.asarray(centers[None])))[0]
    # same neighbour SETS (jax top_k with ties may order differently)
    for c in range(8):
        assert set(native[c].tolist()) == set(ref[c].tolist())


def test_fbank_dispatch_prefers_native():
    from modelcompose_tpu.data.audio_processing import kaldi_fbank
    wav = (np.random.RandomState(3).randn(8000) * (2 ** 15)
           ).astype(np.float32)
    a = kaldi_fbank(wav, use_native=True)
    b = kaldi_fbank(wav, use_native=False)
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


def test_knn_native_k_exceeds_points():
    """k > n: row stride stays k; the tail repeats the farthest valid
    neighbour instead of leaving uninitialized indices (round-3 advisor
    finding on native/mcdata.cc mc_knn)."""
    rs = np.random.RandomState(4)
    xyz = rs.randn(5, 3).astype(np.float32)
    centers = xyz[:3].copy()
    out = knn_native(xyz, centers, 8)
    if out is None:  # no native lib in this environment
        return
    assert out.shape == (3, 8)
    assert ((out >= 0) & (out < 5)).all()
    for row in out:
        assert sorted(row[:5].tolist()) == [0, 1, 2, 3, 4]
        assert (row[5:] == row[4]).all()


def test_fps_native_input_guards():
    """Empty clouds / OOB start_index raise in the wrapper instead of
    reading out of bounds in C (round-5 advisor finding, mc_fps)."""
    import pytest
    from modelcompose_tpu.utils.native import fps_native, native_available
    if not native_available():
        return
    pts = np.random.RandomState(0).randn(8, 3).astype(np.float32)
    assert fps_native(pts, 0).shape == (0,)
    with pytest.raises(ValueError):
        fps_native(np.zeros((0, 3), np.float32), 4)
    with pytest.raises(ValueError):
        fps_native(pts, 4, start_index=8)
    with pytest.raises(ValueError):
        fps_native(pts, 4, start_index=-1)
