import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from points2surf_tpu.ops import voxel


def test_space_transforms_roundtrip(rng):
    res = 32
    vs = np.stack(np.nonzero(np.ones((4, 4, 4))), 1).astype(np.float32)
    ms = np.asarray(voxel.volume_space_to_model_space(jnp.asarray(vs), res))
    back = np.asarray(voxel.model_space_to_volume_space(jnp.asarray(ms), res))
    np.testing.assert_array_equal(back, vs.astype(np.int32))


def test_make_grid_points(rng):
    res = 8
    pts = voxel.make_grid_points(res)
    assert pts.shape == (res**3, 3)
    vs = 1.0 / res
    assert abs(pts.min() - (-1.0 + vs / 2)) < 1e-6
    assert abs(pts.max() - (1.0 - vs / 2)) < 1e-6


def test_voxelize(rng):
    res = 16
    pts = (rng.rand(100, 3).astype(np.float32) * 1.8) - 0.9
    vol = np.asarray(voxel.voxelize(jnp.asarray(pts), 100, res))
    ids = np.floor((pts + 1.0) / 2.0 * res).astype(int)
    want = np.zeros((res, res, res), bool)
    want[ids[:, 0], ids[:, 1], ids[:, 2]] = True
    np.testing.assert_array_equal(vol, want)


def test_voxelize_ignores_padding(rng):
    res = 16
    pts = np.zeros((64, 3), np.float32)
    pts[:5] = rng.rand(5, 3) * 0.5
    vol = np.asarray(voxel.voxelize(jnp.asarray(pts), 5, res))
    assert vol.sum() <= 5
    # the origin voxel (where padding rows land) must not be set by padding
    origin = np.floor((np.zeros(3) + 1.0) / 2.0 * res).astype(int)
    ids = np.floor((pts[:5] + 1.0) / 2.0 * res).astype(int)
    if not (ids == origin).all(axis=1).any():
        assert not vol[origin[0], origin[1], origin[2]]


def test_box_sum_matches_scipy(rng):
    vol = rng.rand(10, 12, 9).astype(np.float32)
    for size in (3, 5):
        got = np.asarray(voxel._box_sum(jnp.asarray(vol), size))
        want = ndimage.convolve(
            vol, np.ones((size, size, size), np.float32), mode="nearest"
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_near_surface_mask_matches_reference_impl(rng):
    """Oracle from reference get_voxel_centers_grid_smaller_pc (sdf.py:46-70)."""
    res = 24
    t = 3
    pts = (rng.rand(200, 3).astype(np.float32) * 1.6) - 0.8

    got = np.asarray(voxel.near_surface_mask(jnp.asarray(pts), 200, res, t))

    ids = np.floor((pts + 1.0) / 2.0 * res).astype(int)
    occ = np.zeros((res, res, res), np.float32)
    occ[ids[:, 0], ids[:, 1], ids[:, 2]] = 1.0
    grown = ndimage.convolve(occ, np.ones((t, t, t), np.float32), mode="nearest")
    want = np.zeros((res, res, res), bool)
    want[:-1, :-1, :-1] = grown[:-1, :-1, :-1] > 0
    np.testing.assert_array_equal(got, want)


def test_grid_query_points(rng):
    res = 24
    pts = (rng.rand(200, 3).astype(np.float32) * 1.6) - 0.8
    q = voxel.grid_query_points(pts, res, 3)
    assert q.ndim == 2 and q.shape[1] == 3
    assert q.shape[0] > 200  # dilation grows the set
    assert (np.abs(q) <= 1.0).all()


def test_splat_to_volume(rng):
    res = 16
    # grid-style unique query points
    q = voxel.make_grid_points(res)[:: 7]
    vals = rng.randn(q.shape[0]).astype(np.float32)
    vol = np.asarray(
        voxel.splat_to_volume(jnp.asarray(q), jnp.asarray(vals), q.shape[0], res)
    )
    ids = np.floor((q + 1.0) / 2.0 * res).astype(int)
    np.testing.assert_allclose(vol[ids[:, 0], ids[:, 1], ids[:, 2]], vals, rtol=1e-6)
    assert np.count_nonzero(vol) <= q.shape[0]


def propagate_sign_oracle(vol, sigma, certainty_threshold):
    """Numpy port of the reference propagate_sign (sdf.py:114-178)."""
    vol = vol.copy()
    vol_sign = np.sign(vol)
    unknown_init = vol_sign == 0
    vol[+0, :, :] = -1.0
    vol[-1, :, :] = -1.0
    vol[:, +0, :] = -1.0
    vol[:, -1, :] = -1.0
    vol[:, :, +0] = -1.0
    vol[:, :, -1] = -1.0
    kernel = np.ones((sigma,) * 3, np.float32)
    while True:
        unknown_before = vol_sign == 0
        if unknown_before.sum() == 0:
            break
        new = ndimage.convolve(vol_sign, kernel, mode="nearest")
        new[np.abs(new) < certainty_threshold] = 0.0
        new = np.sign(new)
        if (new == 0).sum() >= unknown_before.sum():
            break
        vol_sign[unknown_init] = new[unknown_init]
    vol[vol == 0] = vol_sign[vol == 0]
    return vol


def test_propagate_sign_matches_oracle(rng):
    res = 20
    vol = np.zeros((res, res, res), np.float32)
    # a sphere of seeds: inside positive, outside negative, sparse
    centers = voxel.make_grid_points(res).reshape(res, res, res, 3)
    d = np.linalg.norm(centers, axis=-1)
    seeds = rng.rand(res, res, res) < 0.08
    vol[seeds] = np.where(d[seeds] < 0.5, 0.4, -0.4)

    got = np.asarray(voxel.propagate_sign(jnp.asarray(vol), 5, 13))
    want = propagate_sign_oracle(vol.copy(), 5, 13)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # interior fully signed
    assert (got[1:-1, 1:-1, 1:-1] != 0).mean() > 0.95


def test_box_sum_int_matches_scipy_exactly(rng):
    """Matmul-path box sum must be bit-exact for sign/occupancy volumes."""
    vol = rng.choice([-1.0, 0.0, 1.0], size=(11, 13, 9)).astype(np.float32)
    for size in (3, 5, 7):
        got = np.asarray(voxel._box_sum_int(jnp.asarray(vol), size))
        want = ndimage.convolve(
            vol, np.ones((size, size, size), np.float32), mode="nearest"
        )
        np.testing.assert_array_equal(got, want)


def test_box_sum_int_large_kernel_fallback(rng):
    vol = rng.choice([0.0, 1.0], size=(40, 40, 40)).astype(np.float32)
    got = np.asarray(voxel._box_sum_int(jnp.asarray(vol), 17))
    want = ndimage.convolve(
        vol, np.ones((17,) * 3, np.float32), mode="nearest"
    )
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_filter_seed_signs_drops_isolated_wrong_seed(rng):
    """A lone wrong-sign seed inside a locally consistent band is reset to
    unknown; consistent seeds and genuine two-sided surface bands are kept."""
    res = 16
    vol = np.zeros((res, res, res), np.float32)
    # consistent positive slab of seeds
    vol[4:10, 4:10, 4] = 0.3
    # one wrong-sign seed in the middle of the slab
    vol[7, 7, 4] = -0.3
    got = np.asarray(voxel.filter_seed_signs(jnp.asarray(vol), 3, 4))
    assert got[7, 7, 4] == 0.0  # outlier dropped
    assert got[5, 5, 4] == np.float32(0.3)  # consistent seeds kept
    # a genuine surface crossing: +/- planes adjacent -> both sides kept
    vol2 = np.zeros((res, res, res), np.float32)
    vol2[:, :, 7] = 0.2
    vol2[:, :, 8] = -0.2
    got2 = np.asarray(voxel.filter_seed_signs(jnp.asarray(vol2), 3, 4))
    np.testing.assert_array_equal(got2, vol2)
