"""Volumetric SDF ops, on device.

TPU-native equivalents of the reference's scipy/numpy volume pipeline
(source/sdf.py): voxel-grid query generation, voxel splatting, and the
iterative sign-propagation that densifies sparse SDF predictions before
marching cubes. Box convolutions are separable and run as three 1-D
convolutions on device; the data-dependent "which voxels are near the
surface" step returns a boolean volume that the host turns into a compact
query list (the only data-dependent-shape step, kept off the jit path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def model_space_to_volume_space(pts_ms, vol_res: int):
    """floor((p + 1) / 2 * res) (reference sdf.py:73-75), clipped for safety."""
    ids = jnp.floor((pts_ms + 1.0) / 2.0 * vol_res).astype(jnp.int32)
    return jnp.clip(ids, 0, vol_res - 1)


def volume_space_to_model_space(pts_vs, vol_res: int):
    """((v + 0.5) / res) * 2 - 1 (reference sdf.py:78-79)."""
    return ((pts_vs + 0.5) / vol_res) * 2.0 - 1.0


def make_grid_points(grid_resolution: int) -> np.ndarray:
    """All voxel centers of the unit-cube grid, (res^3, 3) float32.

    Same point set as reference sdf.py:9-17 (ordering differs; nothing
    downstream depends on ordering since splatting recomputes voxel ids).
    """
    vs = 1.0 / grid_resolution
    lin = np.linspace(-1.0, 1.0 - vs, grid_resolution, dtype=np.float32) + vs
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1)
    return pts - vs * 0.5


@functools.partial(jax.jit, static_argnames=("vol_res",))
def voxelize(pts_ms: jax.Array, n_valid: jax.Array, vol_res: int) -> jax.Array:
    """Binary occupancy volume of a (padded) point cloud (sdf.py:56-59)."""
    ids = model_space_to_volume_space(pts_ms, vol_res)
    valid = jnp.arange(pts_ms.shape[0]) < n_valid
    vol = jnp.zeros((vol_res, vol_res, vol_res), jnp.bool_)
    # route padding rows to a corner voxel then unset is not possible; instead
    # scatter True only for valid rows by redirecting invalid rows onto a
    # voxel they cannot corrupt: scatter value False.
    return vol.at[ids[:, 0], ids[:, 1], ids[:, 2]].max(valid)


def _box_sum(vol: jax.Array, size: int) -> jax.Array:
    """Separable (size^3) box-filter sum with edge replication.

    Matches scipy.ndimage.convolve(ones((s,s,s)), mode='nearest')
    (reference sdf.py:62-63, 162) via three 1-D valid convolutions over an
    edge-padded volume.
    """
    lo = (size - 1) // 2
    hi = size - 1 - lo
    x = vol
    for axis in range(3):
        pad = [(0, 0)] * 3
        pad[axis] = (lo, hi)
        xp = jnp.pad(x, pad, mode="edge")
        # cumulative-sum trick: windowed sum along `axis`
        cs = jnp.cumsum(xp, axis=axis, dtype=jnp.float32)
        zeros_shape = list(cs.shape)
        zeros_shape[axis] = 1
        cs = jnp.concatenate(
            [jnp.zeros(zeros_shape, cs.dtype), cs], axis=axis
        )
        n = vol.shape[axis]
        upper = jax.lax.slice_in_dim(cs, size, size + n, axis=axis)
        lower = jax.lax.slice_in_dim(cs, 0, n, axis=axis)
        x = upper - lower
    return x


def _band_matrix(n: int, size: int) -> jax.Array:
    """(n, n) banded ones matrix B with B[i, j] = multiplicity of source row
    j in the edge-replicated length-``size`` window centered at i; B @ x is
    the 1-D box-filter sum with mode='nearest' borders. Row sums == size."""
    offs = jnp.arange(size) - (size - 1) // 2
    src = jnp.clip(jnp.arange(n)[:, None] + offs[None, :], 0, n - 1)
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], src.shape)
    return jnp.zeros((n, n), jnp.bfloat16).at[rows, src].add(1.0)


def _box_sum_int(vol: jax.Array, size: int) -> jax.Array:
    """Exact (size^3) box-filter sum for volumes whose values are small
    integers (|v| <= 1 here: sign fields / binary occupancy).

    Same semantics as :func:`_box_sum` but expressed as three banded-matrix
    matmuls in bf16 so the filter rides the MXU instead of the sequential
    cumsum path — ~20x faster per 256^3 round, and the dominant cost of
    sign propagation (reference sdf.py:162's scipy convolve). Exactness:
    all intermediates are integers <= size^2 <= 256, which bf16 represents
    exactly; the final axis accumulates in f32.
    """
    if size * size > 256:  # bf16 integer-exactness bound
        return _box_sum(vol, size)
    x = vol.astype(jnp.bfloat16)
    b0 = _band_matrix(vol.shape[0], size)
    b1 = _band_matrix(vol.shape[1], size)
    b2 = _band_matrix(vol.shape[2], size)
    x = jnp.einsum("ij,jkl->ikl", b0, x,
                   preferred_element_type=jnp.bfloat16)
    x = jnp.einsum("ij,kjl->kil", b1, x,
                   preferred_element_type=jnp.bfloat16)
    return jnp.einsum("ij,klj->kli", b2, x,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("vol_res", "threshold_vs"))
def near_surface_mask(
    pts_ms: jax.Array, n_valid: jax.Array, vol_res: int, threshold_vs: int
) -> jax.Array:
    """Boolean volume of voxels within a box neighborhood of the cloud.

    Reference ``get_voxel_centers_grid_smaller_pc`` (sdf.py:46-70):
    voxelize, box-convolve with ones((t,t,t)), keep nonzero — with the
    reference's quirk of dropping the last plane in each dimension
    (sdf.py:66) reproduced so query counts match exactly.
    """
    occ = voxelize(pts_ms, n_valid, vol_res).astype(jnp.float32)
    grown = _box_sum_int(occ, threshold_vs) > 0.0
    keep = jnp.ones((vol_res,), jnp.bool_).at[-1].set(False)
    return (
        grown
        & keep[:, None, None]
        & keep[None, :, None]
        & keep[None, None, :]
    )


def _morton_order_host(vs: np.ndarray) -> np.ndarray:
    """Sort voxel coordinates by Morton code (host).

    Batches sliced from a Morton-ordered query list are tight spatial
    blocks, which keeps the tiled kNN's exactness certificates passing
    (ops/patches.py); np.nonzero's scan order produces long thin slabs.
    """
    g = vs.astype(np.int64)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = spread(g[:, 0]) | (spread(g[:, 1]) << 1) | (spread(g[:, 2]) << 2)
    return np.argsort(code, kind="stable")


def grid_query_points(
    pts_ms: np.ndarray, vol_res: int, threshold_vs: int
) -> np.ndarray:
    """Near-surface voxel centers in model space, (Q, 3) float32 (host),
    Morton-ordered for spatial coherence.

    Computes the mask on device, then extracts the (data-dependent) compact
    list on host. Equivalent to reference sdf.py:46-70 + data_loader.py:300-310
    (the reference's voxel ORDER is immaterial: splatting recomputes voxel
    ids from positions)."""
    pts = jnp.asarray(pts_ms[:, :3], jnp.float32)
    mask = np.asarray(near_surface_mask(pts, pts.shape[0], vol_res, threshold_vs))
    vs = np.stack(np.nonzero(mask), axis=1)
    vs = vs[_morton_order_host(vs)].astype(np.float32)
    return (((vs + 0.5) / vol_res) * 2.0 - 1.0).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("vol_res",))
def splat_to_volume(
    pos_ms: jax.Array, val: jax.Array, n_valid: jax.Array, vol_res: int
) -> jax.Array:
    """Scatter SDF samples into a zero-initialized volume (sdf.py:82-111).

    Grid-generated query points hit each voxel at most once, so a plain
    scatter suffices (the reference's closest-to-center tie-break degenerates
    to first-wins because it measures distance of each sample to itself,
    sdf.py:93-94). Padding rows (index >= n_valid) write 0, a no-op value.
    """
    ids = model_space_to_volume_space(pos_ms, vol_res)
    valid = jnp.arange(pos_ms.shape[0]) < n_valid
    v = jnp.where(valid, val, 0.0)
    vol = jnp.zeros((vol_res, vol_res, vol_res), jnp.float32)
    return vol.at[ids[:, 0], ids[:, 1], ids[:, 2]].add(v)


@functools.partial(jax.jit, static_argnames=("size", "threshold"))
def filter_seed_signs(
    vol: jax.Array, size: int = 3, threshold: int = 4
) -> jax.Array:
    """Zero out seed voxels whose sign disagrees with the local seed majority.

    Flood-containment pre-pass for :func:`propagate_sign`: the round-3
    failure analysis (docs/VALIDATION.md) showed that a handful of
    wrong-sign predictions in the near-surface band open "channels" through
    which the iterative sign propagation floods the whole volume — the
    reference shares the propagation semantics (sdf.py:114-178) and the
    cliff. A seed whose sign is opposed by at least ``threshold`` net
    neighboring seeds (in a ``size``^3 box, excluding itself) is reset to
    unknown (0), so propagation fills it from its (locally consistent)
    surroundings instead of it seeding a flood. Voxels at the true surface
    see both signs in-balance and are untouched for any threshold >= 2.
    """
    sign0 = jnp.sign(vol)
    others = _box_sum_int(sign0, size) - sign0
    bad = (sign0 * others) <= -float(threshold)
    return jnp.where(bad, 0.0, vol)


@functools.partial(jax.jit, static_argnames=("sigma", "certainty_threshold"))
def propagate_sign(
    vol: jax.Array, sigma: int = 5, certainty_threshold: int = 13
) -> jax.Array:
    """Iteratively propagate SDF signs from seed voxels (sdf.py:114-178).

    Each round sums the current {-1,0,+1} sign field over a (sigma^3) box;
    unknown voxels whose neighborhood sum clears the certainty threshold
    adopt the majority sign. Stops when nothing changes. The volume borders
    are assumed outside (forced to -1) in the *output*, mirroring the
    reference's in-place border write (sdf.py:149-154), which by its
    ordering does not seed the propagation itself.
    """
    sign0 = jnp.sign(vol)
    unknown_init = sign0 == 0.0

    def cond(state):
        _, go = state
        return go

    def body(state):
        sign, _ = state
        unknown_before = jnp.sum(sign == 0.0)
        conv = _box_sum_int(sign, sigma)
        new = jnp.where(jnp.abs(conv) < certainty_threshold, 0.0, conv)
        new = jnp.sign(new)
        unknown_after = jnp.sum(new == 0.0)
        do_merge = (unknown_before > 0) & (unknown_after < unknown_before)
        sign = jnp.where(unknown_init & do_merge, new, sign)
        return sign, do_merge

    sign_final, _ = jax.lax.while_loop(cond, body, (sign0, jnp.bool_(True)))

    vol_b = vol
    for axis in range(3):
        idx = [slice(None)] * 3
        idx[axis] = 0
        vol_b = vol_b.at[tuple(idx)].set(-1.0)
        idx[axis] = -1
        vol_b = vol_b.at[tuple(idx)].set(-1.0)
    return jnp.where(vol_b == 0.0, sign_final, vol_b)
