"""Implicit surface -> mesh: splat, sign propagation (device), marching (host).

Reference: source/sdf.py:181-266. The volume pipeline (splat + iterative
sign propagation + clamping) runs on device as one jitted program; the
data-dependent isosurface extraction runs on host.
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from points2surf_tpu.ops import marching_cubes, voxel
from points2surf_tpu.utils import file_utils, mesh_io


@functools.partial(
    jax.jit, static_argnames=("grid_res", "sigma", "certainty_threshold")
)
def _build_volume(query_pts, query_dist, n_valid, grid_res, sigma,
                  certainty_threshold):
    vol = voxel.splat_to_volume(query_pts, query_dist, n_valid, grid_res)
    vol = voxel.propagate_sign(vol, sigma, certainty_threshold)
    return jnp.clip(vol, -1.0, 1.0)


def implicit_surface_to_mesh(
    query_dist_ms: np.ndarray,
    query_pts_ms: np.ndarray,
    volume_out_file: str,
    mc_out_file: str,
    grid_res: int,
    sigma: int,
    certainty_threshold: int = 26,
) -> bool:
    """Densify sparse SDF samples and extract the zero isosurface
    (reference sdf.py:181-230). Returns True when a mesh was written."""
    if float(np.max(query_dist_ms)) == 0.0 and float(np.min(query_dist_ms)) == 0.0:
        print(f"WARNING: implicit surface for {volume_out_file} "
              "contains only zeros")
        return False

    t0 = time.time()
    vol = np.asarray(
        _build_volume(
            jnp.asarray(query_pts_ms),
            jnp.asarray(query_dist_ms),
            query_pts_ms.shape[0],
            grid_res,
            sigma,
            certainty_threshold,
        )
    )
    print(f"Sign propagation took: {time.time() - t0}")

    # colored query-point debug volume (reference sdf.py:204-209)
    dist_norm = query_dist_ms / max(float(np.abs(query_dist_ms).max()), 1e-12)
    colors = np.zeros((dist_norm.shape[0], 3))
    neg = dist_norm < 0.0
    pos = dist_norm > 0.0
    colors[neg, 0] = np.abs(dist_norm[neg]) + 0.5
    colors[pos, 1] = dist_norm[pos] + 0.5
    mesh_io.write_off(
        volume_out_file, query_pts_ms, np.array([]), colors_vertex=colors
    )

    if vol.min() < 0.0 < vol.max():
        t0 = time.time()
        v, f = marching_cubes.extract_isosurface(vol, 0.0)
        print(f"Isosurface extraction took: {time.time() - t0}")
        if v.size == 0:
            print("Warning: isosurface extraction gives no result!")
            return False
        # voxel-index -> model space (reference sdf.py:224)
        v = (((v + 0.5) / float(grid_res)) - 0.5) * 2.0
        file_utils.make_dir_for_file(mc_out_file)
        mesh_io.write_ply(mc_out_file, v, f)
        return True
    print("Warning: volume for marching cubes contains no 0-level set!")
    return False


def implicit_surface_to_mesh_file(
    query_dist_ms_file, query_pts_ms_file,
    volume_out_file, mc_out_file, grid_res, sigma, certainty_threshold,
):
    query_dist_ms = np.load(query_dist_ms_file)
    query_pts_ms = np.load(query_pts_ms_file)
    implicit_surface_to_mesh(
        query_dist_ms, query_pts_ms,
        volume_out_file, mc_out_file, grid_res, sigma, certainty_threshold,
    )


def implicit_surface_to_mesh_directory(
    imp_surf_dist_ms_dir, query_pts_ms_dir,
    vol_out_dir, mesh_out_dir,
    grid_res, sigma, certainty_threshold, num_processes=1,
):
    """Per-directory driver (reference sdf.py:241-266).

    Runs serially in-process: the volume stage is a device program (a
    process pool would contend for the single accelerator), and the host
    marching stage is vectorized numpy.
    """
    os.makedirs(vol_out_dir, exist_ok=True)
    os.makedirs(mesh_out_dir, exist_ok=True)

    dist_files = [
        f
        for f in sorted(os.listdir(imp_surf_dist_ms_dir))
        if os.path.isfile(os.path.join(imp_surf_dist_ms_dir, f))
        and f.endswith(".xyz.npy")
    ]
    for f in dist_files:
        dist_in = os.path.join(imp_surf_dist_ms_dir, f)
        pts_in = os.path.join(query_pts_ms_dir, f)
        vol_out = os.path.join(vol_out_dir, f[:-8] + ".off")
        mesh_out = os.path.join(mesh_out_dir, f[:-8] + ".ply")
        if file_utils.call_necessary([dist_in, pts_in], [vol_out, mesh_out]):
            implicit_surface_to_mesh_file(
                dist_in, pts_in, vol_out, mesh_out,
                grid_res, sigma, certainty_threshold,
            )
