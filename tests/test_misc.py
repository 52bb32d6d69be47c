"""Unit tests for the numeric substrate (reference test/fnft__misc/*)."""

import numpy as np
import jax.numpy as jnp
import pytest

from fnft_tpu.utils import misc


def test_rel_err_and_hausdorff():
    a = jnp.asarray([1.0 + 0j, 2.0, 3.0])
    b = jnp.asarray([1.0 + 0j, 2.0, 4.0])
    assert abs(float(misc.rel_err(b, a)) - 1.0 / 6.0) < 1e-14
    h = float(misc.hausdorff_dist(jnp.asarray([0.0 + 0j, 1.0]),
                                  jnp.asarray([0.5 + 0j])))
    assert abs(h - 0.5) < 1e-14


def test_l2norm2_trapezoid():
    # constant |q|=2 on [0,1]: reference weighting gives 4*(D-1)/D
    d = 64
    q = jnp.full((d,), 2.0 + 0j)
    assert abs(float(misc.l2norm2(q, 0.0, 1.0)) - 4.0 * (d - 1) / d) < 1e-12


def test_filter_and_merge_masks():
    vals = jnp.asarray([1 + 1j, 5 + 1j, 1.0000001 + 1j, 2 - 1j, np.nan + 0j])
    box = (0.0, 3.0, 0.0, 2.0)
    m = misc.filter_mask(vals, box)
    assert list(np.asarray(m)) == [True, False, True, False, False]
    mm = misc.merge_mask(vals, 1e-3, m)
    assert list(np.asarray(mm)) == [True, False, False, False, False]
    inv = misc.filter_inv_mask(vals, box)
    assert list(np.asarray(inv)) == [False, True, False, True, True]


def test_resample_phase_shift():
    # band-limited signal: fractional delay must be near-exact
    d = 256
    t = np.linspace(0, 2 * np.pi, d, endpoint=False)
    q = np.exp(1j * 3 * t) + 0.5 * np.exp(-1j * 2 * t)
    eps_t = t[1] - t[0]
    delta = 0.37 * eps_t
    shifted = np.asarray(misc.resample(jnp.asarray(q), eps_t, delta))
    expected = np.exp(1j * 3 * (t + delta)) + 0.5 * np.exp(-1j * 2 * (t + delta))
    np.testing.assert_allclose(shifted, expected, atol=1e-12)


def test_downsample():
    q = jnp.arange(16) + 0j
    qs, (first, last) = misc.downsample(q, 4)
    assert first == 0 and last == 12
    np.testing.assert_array_equal(np.asarray(qs), [0, 4, 8, 12])


def test_bandlimit_violation_flags_noise():
    rng = np.random.default_rng(0)
    d = 512
    smooth = np.exp(-np.linspace(-5, 5, d) ** 2) + 0j
    noisy = rng.normal(size=d) + 0j
    assert float(misc.bandlimit_violation(jnp.asarray(smooth), 0.1)) < 1e-8
    assert float(misc.bandlimit_violation(jnp.asarray(noisy), 0.1)) > 1e-2
