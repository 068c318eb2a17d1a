"""The PointsToSurf dual-branch SDF regressor, as a flax module.

Re-design of the reference ``PointsToSurfModel``
(source/points_to_surf_model.py:237-352): a local kNN-patch encoder and a
global query-centered sub-sample encoder, fused by an MLP head that
regresses the SDF at the query point (absolute distance magnitude +
inside/outside sign logit by default, or raw signed distance in the
regression variant).

Variants (mutually exclusive, reference :250-267):
  * vanilla: two encoders; the global branch's QSTN rotation is also
    applied to the local patch (:337-339).
  * shared_transformation: one QSTN consumes BOTH point sets concatenated
    and rotates both (:325-331).
  * single_transformer: one encoder consumes both point sets concatenated
    (:320-323).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from points2surf_tpu.models.pointnet import BN, PLinear, PointNetFeat, QSTN
from points2surf_tpu.ops import geometry


class PointsToSurfModel(nn.Module):
    net_size_max: int = 1024
    output_dim: int = 2
    use_point_stn: bool = True
    use_feat_stn: bool = True
    sym_op: str = "max"
    single_transformer: bool = False
    shared_transformation: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, batch: dict, train: bool = False):
        """Args: batch dict with
          patch_pts_ps: (B, P, 3) local patch in patch space,
          pts_sub_sample_ms: (B, S, 3) global sub-sample in model space,
          imp_surf_query_point_ms: (B, 3) query point in model space.
        Returns (B, output_dim) raw predictions (pre-postprocessing).
        """
        d = self.dtype
        patch = batch["patch_pts_ps"]
        sub = batch["pts_sub_sample_ms"]
        query = batch["imp_surf_query_point_ms"]

        # center the global sub-sample at the query point so both branches
        # describe the neighborhood of the query (reference :302-303)
        sub = sub - query[:, None, :]

        if self.single_transformer:
            both = jnp.concatenate([patch, sub], axis=1)
            feat, _, _, _ = PointNetFeat(
                net_size_max=self.net_size_max,
                output_size=self.net_size_max,
                use_point_stn=self.use_point_stn,
                use_feat_stn=self.use_feat_stn,
                sym_op=self.sym_op,
                dtype=d,
                name="feat_local_global",
            )(both, train)
            h = nn.relu(
                BN(d, name="bn1_local_global")(
                    PLinear(self.net_size_max, d, name="fc1_local_global")(
                        feat
                    ),
                    train,
                )
            )
        else:
            if self.use_point_stn and self.shared_transformation:
                both = jnp.concatenate([patch, sub], axis=1)
                trans, _ = QSTN(self.net_size_max, d, name="point_stn")(
                    both, train
                )
                sub = geometry.transform_points(sub, trans)
                patch = geometry.transform_points(patch, trans)

            g, trans_global, _, _ = PointNetFeat(
                net_size_max=self.net_size_max,
                output_size=self.net_size_max,
                use_point_stn=self.use_point_stn
                and not self.shared_transformation,
                use_feat_stn=self.use_feat_stn,
                sym_op=self.sym_op,
                dtype=d,
                name="feat_global",
            )(sub, train)
            g = nn.relu(
                BN(d, name="bn1_global")(
                    PLinear(self.net_size_max // 2, d, name="fc1_global")(g),
                    train,
                )
            )

            if self.use_point_stn and not self.shared_transformation:
                # rotate the local patch like the global sub-sample (:337-339)
                patch = geometry.transform_points(patch, trans_global)

            l, _, _, _ = PointNetFeat(
                net_size_max=self.net_size_max,
                output_size=self.net_size_max,
                use_point_stn=False,
                use_feat_stn=self.use_feat_stn,
                sym_op=self.sym_op,
                dtype=d,
                name="feat_local",
            )(patch, train)
            l = nn.relu(
                BN(d, name="bn1_local")(
                    PLinear(self.net_size_max // 2, d, name="fc1_local")(l),
                    train,
                )
            )
            h = jnp.concatenate([l, g], axis=1)

        h = nn.relu(
            BN(d, name="bn2")(
                PLinear(self.net_size_max // 4, d, name="fc2")(h), train
            )
        )
        h = nn.relu(
            BN(d, name="bn3")(
                PLinear(self.net_size_max // 8, d, name="fc3")(h), train
            )
        )
        return PLinear(self.output_dim, d, name="fc4")(h)
