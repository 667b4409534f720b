import numpy as np
import scipy.ndimage as ndi

from gat_tpu.ops.filters import (median_filter1d, maximum_filter1d,
                                 uniform_filter1d, masked_percentile)


def test_median_filter_matches_scipy(rng):
    x = rng.normal(size=200).astype(np.float32)
    ours = np.asarray(median_filter1d(x, 5))
    np.testing.assert_allclose(ours, ndi.median_filter(x, size=5), atol=1e-6)


def test_maximum_filter_matches_scipy(rng):
    x = rng.normal(size=100).astype(np.float32)
    for size, origin in [(2, 0), (3, 1), (3, -1), (9, 0), (5, 2)]:
        ours = np.asarray(maximum_filter1d(x, size, origin=origin))
        ref = ndi.maximum_filter1d(x, size, origin=origin, mode="constant")
        np.testing.assert_allclose(ours, ref, atol=1e-6,
                                   err_msg=f"size={size} origin={origin}")


def test_uniform_filter_matches_scipy(rng):
    x = rng.normal(size=100).astype(np.float32)
    for size, origin in [(9, 0), (5, 0), (4, 1), (7, -2)]:
        ours = np.asarray(uniform_filter1d(x, size, origin=origin))
        ref = ndi.uniform_filter1d(x, size, origin=origin, mode="nearest")
        np.testing.assert_allclose(ours, ref, atol=1e-5,
                                   err_msg=f"size={size} origin={origin}")


def test_masked_percentile_matches_numpy(rng):
    x = rng.normal(size=300).astype(np.float32)
    for q in (20.0, 50.0, 75.0, 99.0):
        # full mask
        full = np.ones(300, bool)
        np.testing.assert_allclose(
            float(masked_percentile(x, q, full)), np.percentile(x, q),
            rtol=1e-5)
        # prefix mask (padding scenario)
        mask = np.arange(300) < 211
        np.testing.assert_allclose(
            float(masked_percentile(x, q, mask)), np.percentile(x[:211], q),
            rtol=1e-5)


def test_rms_frames_matches_direct(rng):
    from gat_tpu.ops.filters import rms_frames
    x = rng.normal(size=5000).astype(np.float32)
    ours = np.asarray(rms_frames(x, 2048, 512))
    xp = np.pad(x, 1024, mode="reflect")
    nf = 1 + (len(xp) - 2048) // 512
    ref = np.array([np.sqrt(np.mean(xp[i * 512:i * 512 + 2048] ** 2))
                    for i in range(nf)])
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_median_filter_even_size_matches_scipy(rng):
    """scipy's rank filter picks the upper-middle element for even
    sizes, not the two-middle average — regression for the documented
    'scipy default semantics' contract."""
    x = rng.normal(size=200).astype(np.float32)
    for size in (2, 4, 6):
        ours = np.asarray(median_filter1d(x, size))
        ref = ndi.median_filter(x, size=size, mode="reflect")
        np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


def test_masked_percentile_empty_mask_is_nan(rng):
    """An all-False mask yields NaN (np.percentile of an empty array
    errors; a silent finfo.max sentinel would look plausible)."""
    x = rng.normal(size=32).astype(np.float32)
    out = np.asarray(masked_percentile(x, 20.0, np.zeros(32, bool)))
    assert np.isnan(out)
    # and a single-element mask is that element at every q
    m = np.zeros(32, bool)
    m[7] = True
    for q in (0.0, 20.0, 100.0):
        assert np.asarray(masked_percentile(x, q, m)) == x[7]
