"""Checkpoint-import parity: our flax model with converted torch weights
must reproduce the reference torch model's outputs.

The reference code is imported read-only from /root/reference as a test
oracle (never copied); tests skip when it isn't mounted.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "source")),
    reason="reference repo not mounted",
)


def _torch_model(**kw):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from source.points_to_surf_model import PointsToSurfModel as TorchP2S

    defaults = dict(
        net_size_max=128,
        num_points=24,
        output_dim=2,
        use_point_stn=True,
        use_feat_stn=True,
        sym_op="max",
        sub_sample_size=32,
        single_transformer=0,
        shared_transformation=False,
    )
    defaults.update(kw)
    return TorchP2S(**defaults), defaults


def _batch(rng, b=6, p=24, s=32):
    import torch

    return {
        "patch_pts_ps": torch.from_numpy(
            rng.randn(b, p, 3).astype(np.float32)
        ),
        "pts_sub_sample_ms": torch.from_numpy(
            rng.randn(b, s, 3).astype(np.float32)
        ),
        "imp_surf_query_point_ms": torch.from_numpy(
            rng.randn(b, 3).astype(np.float32)
        ),
    }


@pytest.mark.parametrize(
    "variant", ["vanilla", "shared", "single", "no_stn", "sum_pool"]
)
def test_forward_parity_with_reference(rng, variant):
    import torch

    import jax
    import jax.numpy as jnp

    from points2surf_tpu.models.import_torch import convert_state_dict
    from points2surf_tpu.models.p2s import PointsToSurfModel

    kw = {}
    if variant == "shared":
        kw = dict(shared_transformation=True)
    elif variant == "single":
        kw = dict(single_transformer=1)
    elif variant == "no_stn":
        kw = dict(use_point_stn=False)
    elif variant == "sum_pool":
        kw = dict(sym_op="sum")
    tm, cfg = _torch_model(**kw)
    tm.eval()

    batch_t = _batch(rng)
    # snapshot BEFORE the torch forward: the reference model mutates
    # pts_sub_sample_ms in place (`-=` through a transposed view,
    # points_to_surf_model.py:303)
    batch_np = {k: v.numpy().copy() for k, v in batch_t.items()}
    with torch.no_grad():
        want = tm(batch_t).numpy()

    params, batch_stats = convert_state_dict(tm.state_dict())
    jm = PointsToSurfModel(
        net_size_max=cfg["net_size_max"],
        output_dim=cfg["output_dim"],
        use_point_stn=bool(cfg["use_point_stn"]),
        use_feat_stn=bool(cfg["use_feat_stn"]),
        sym_op=cfg["sym_op"],
        single_transformer=bool(cfg["single_transformer"]),
        shared_transformation=bool(cfg["shared_transformation"]),
    )
    batch_j = {k: jnp.asarray(v) for k, v in batch_np.items()}
    got = np.asarray(
        jm.apply(
            {"params": params, "batch_stats": batch_stats}, batch_j, False
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_converted_tree_matches_init_structure(rng):
    """Converted pytree must align leaf-for-leaf with a fresh init."""
    import jax
    import jax.numpy as jnp

    from points2surf_tpu.models.import_torch import convert_state_dict
    from points2surf_tpu.models.p2s import PointsToSurfModel

    tm, cfg = _torch_model()
    params, batch_stats = convert_state_dict(tm.state_dict())

    jm = PointsToSurfModel(
        net_size_max=cfg["net_size_max"], output_dim=cfg["output_dim"]
    )
    dummy = {
        "patch_pts_ps": jnp.zeros((2, 24, 3)),
        "pts_sub_sample_ms": jnp.zeros((2, 32, 3)),
        "imp_surf_query_point_ms": jnp.zeros((2, 3)),
    }
    variables = jm.init(jax.random.key(0), dummy, False)

    def paths(tree):
        return {
            jax.tree_util.keystr(p): l.shape
            for p, l in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(params) == paths(variables["params"])
    assert paths(batch_stats) == paths(variables["batch_stats"])


def test_dataparallel_prefix_stripped(rng):
    from points2surf_tpu.models.import_torch import convert_state_dict

    tm, _ = _torch_model()
    sd = {"module." + k: v for k, v in tm.state_dict().items()}
    params, batch_stats = convert_state_dict(sd)
    assert "feat_global" in params


def test_export_state_dict_round_trip(rng):
    """flax -> torch export (import_torch.export_state_dict) must invert the
    import exactly: a torch->flax->torch round trip reloads with
    strict=True and reproduces every tensor bit-for-bit, so a TPU-trained
    checkpoint can drive the reference's torch eval stack."""
    import torch

    from points2surf_tpu.models.import_torch import (
        convert_state_dict,
        export_state_dict,
    )

    tm, _ = _torch_model(shared_transformation=True)
    want_sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params, batch_stats = convert_state_dict(tm.state_dict())
    got_sd = export_state_dict(params, batch_stats)

    assert set(got_sd) == set(want_sd)
    for k in want_sd:
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(got_sd[k], want_sd[k], err_msg=k)

    # a fresh torch model must accept the exported dict strictly and
    # reproduce the original forward
    tm2, _ = _torch_model(shared_transformation=True)
    tm2.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                         for k, v in got_sd.items()}, strict=True)
    tm.eval(), tm2.eval()
    batch_np = {k: v.numpy().copy() for k, v in _batch(rng).items()}

    def fresh():  # the reference forward mutates its inputs in place
        return {k: torch.from_numpy(v.copy()) for k, v in batch_np.items()}

    with torch.no_grad():
        a = tm(fresh()).numpy()
        b = tm2(fresh()).numpy()
    np.testing.assert_array_equal(a, b)

    # DataParallel layout: the released-checkpoint key format
    dp = export_state_dict(params, batch_stats, data_parallel=True)
    assert all(k.startswith("module.") for k in dp)


def test_multiscale_encoder_parity_with_reference(rng):
    """num_scales=2 PointNetfeat (the reference's dormant multi-scale
    branch, model.py:166-230) must match: per-scale pooling + conv4/bn4
    expansion + STN fc0/bn0 funnel."""
    import torch

    import jax.numpy as jnp

    from points2surf_tpu.models.import_torch import convert_state_dict
    from points2surf_tpu.models.pointnet import PointNetFeat

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from source.points_to_surf_model import PointNetfeat as TorchFeat

    num_scales, num_points, out_size = 2, 24, 64
    tm = TorchFeat(
        net_size_max=128, num_scales=num_scales, num_points=num_points,
        use_point_stn=True, use_feat_stn=True, output_size=out_size,
        sym_op="max",
    )
    tm.eval()
    x_np = rng.randn(5, num_scales * num_points, 3).astype(np.float32)
    with torch.no_grad():
        want, _, _, _ = tm(torch.from_numpy(x_np.transpose(0, 2, 1)))
    want = want.numpy()

    params, batch_stats = convert_state_dict(tm.state_dict())
    jm = PointNetFeat(
        net_size_max=128, output_size=out_size, use_point_stn=True,
        use_feat_stn=True, sym_op="max", num_scales=num_scales,
    )
    got, _, _, _ = jm.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x_np), False,
    )
    assert got.shape == (5, out_size * num_scales**2)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)
