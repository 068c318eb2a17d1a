"""PointNet-style encoders with spatial transformers, as flax modules.

Functional re-design of the reference's torch modules
(source/points_to_surf_model.py:12-234). The torch ``Conv1d(kernel=1)``
layers are pointwise linear maps over the point axis, which XLA fuses into
large batched matmuls on the MXU; points are laid out as ``(B, n, C)``
(channels-last, the TPU-friendly layout). BatchNorm statistics are computed
over all non-feature axes, matching torch ``BatchNorm1d`` on ``(B, C, n)``;
under pjit with the batch sharded over the mesh's data axis, the reductions
are global automatically — eliminating the reference's DataParallel/
BatchNorm pitfall (full_run.py:8-13).

Submodule names mirror the reference state_dict keys (conv1/bn1/fc1/...) so
that released ``.pth`` checkpoints map 1:1 onto our param pytree
(see models/import_torch.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from points2surf_tpu.ops import geometry


def torch_linear_init(fan_in: int):
    """torch's default Linear/Conv init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    kaiming_uniform_(a=sqrt(5)) reduces to exactly this bound; using it keeps
    our training dynamics aligned with the reference's.
    """
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class PLinear(nn.Module):
    """Pointwise linear layer (torch Conv1d(k=1) / Linear equivalent)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            kernel_init=torch_linear_init(fan_in),
            bias_init=torch_linear_init(fan_in),
            dtype=self.dtype,
            name="linear",
        )(x)


class BN(nn.Module):
    """BatchNorm matching torch BatchNorm1d defaults (eps 1e-5, mom 0.1)."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="norm",
        )(x)


def _scale_pool(h, num_scales: int, sym_op: str = "max"):
    """Per-scale symmetric pooling: the point axis holds ``num_scales``
    equal-length segments (one per scale); pool each segment separately and
    concatenate scale-major along channels (reference model.py:48-56,
    219-230 multi-scale branches)."""
    b, n, c = h.shape
    h = h.reshape(b, num_scales, n // num_scales, c)
    h = jnp.max(h, axis=2) if sym_op == "max" else jnp.sum(h, axis=2)
    return h.reshape(b, num_scales * c)


class _STNTrunk(nn.Module):
    """Shared conv trunk + FC head of STN/QSTN (model.py:41-64, 100-122)."""

    net_size_max: int = 1024
    out_features: int = 9
    dtype: Optional[jnp.dtype] = None
    num_scales: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        d = self.dtype
        h = nn.relu(BN(d, name="bn1")(PLinear(64, d, name="conv1")(x), train))
        h = nn.relu(BN(d, name="bn2")(PLinear(128, d, name="conv2")(h), train))
        h = nn.relu(
            BN(d, name="bn3")(
                PLinear(self.net_size_max, d, name="conv3")(h), train
            )
        )
        # symmetric max over points; per scale segment when multi-scale
        # (the reference STN pools with max regardless of sym_op,
        # model.py:25,48-55)
        h = _scale_pool(h, self.num_scales)
        if self.num_scales > 1:
            h = nn.relu(
                BN(d, name="bn0")(
                    PLinear(self.net_size_max, d, name="fc0")(h), train
                )
            )
        h = nn.relu(
            BN(d, name="bn4")(
                PLinear(self.net_size_max // 2, d, name="fc1")(h), train
            )
        )
        h = nn.relu(
            BN(d, name="bn5")(
                PLinear(self.net_size_max // 4, d, name="fc2")(h), train
            )
        )
        return PLinear(self.out_features, d, name="fc3")(h)


class STN(nn.Module):
    """Feature spatial transformer: outputs a (dim x dim) matrix + identity.

    Reference source/points_to_surf_model.py:12-69.
    """

    net_size_max: int = 1024
    dim: int = 64
    dtype: Optional[jnp.dtype] = None
    num_scales: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _STNTrunk(
            self.net_size_max, self.dim * self.dim, self.dtype,
            self.num_scales, name="trunk"
        )(x, train)
        iden = jnp.eye(self.dim, dtype=h.dtype).reshape(-1)
        return (h + iden).reshape(x.shape[0], self.dim, self.dim)


class QSTN(nn.Module):
    """Quaternion point transformer: regresses a rotation (model.py:72-131).

    The network outputs a 4-vector added to the identity quaternion
    ``[1, 0, 0, 0]`` (so zero output = identity rotation), converted to a
    rotation matrix via the Hamilton-product formula.
    """

    net_size_max: int = 1024
    dtype: Optional[jnp.dtype] = None
    num_scales: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _STNTrunk(self.net_size_max, 4, self.dtype, self.num_scales,
                      name="trunk")(x, train)
        quat = h + jnp.asarray([1.0, 0.0, 0.0, 0.0], h.dtype)
        return geometry.quat_to_rotmat(quat), quat


class PointNetFeat(nn.Module):
    """Shared-MLP point encoder (reference model.py:134-234).

    Input ``(B, n, 3)`` points, output ``(B, output_size)`` codeword via:
    optional QSTN rotation -> MLP(64, 64) -> optional 64-d feature STN ->
    MLP(64, 128, output_size) -> symmetric max (or sum) pool.
    """

    net_size_max: int = 1024
    output_size: int = 1024
    use_point_stn: bool = True
    use_feat_stn: bool = True
    sym_op: str = "max"
    dtype: Optional[jnp.dtype] = None
    num_scales: int = 1  # multi-scale branch (reference model.py:166-230):
    # the point axis carries num_scales equal segments; codeword becomes
    # (B, output_size * num_scales**2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        trans = None
        trans_quat = None
        if self.use_point_stn:
            trans, trans_quat = QSTN(
                self.net_size_max, d, self.num_scales, name="stn1"
            )(x, train)
            x = geometry.transform_points(x, trans)

        h = nn.relu(BN(d, name="bn0a")(PLinear(64, d, name="conv0a")(x), train))
        h = nn.relu(BN(d, name="bn0b")(PLinear(64, d, name="conv0b")(h), train))

        trans2 = None
        if self.use_feat_stn:
            trans2 = STN(self.net_size_max, 64, d, self.num_scales,
                         name="stn2")(h, train)
            h = jnp.einsum("bij,bnj->bni", trans2, h)

        h = nn.relu(BN(d, name="bn1")(PLinear(64, d, name="conv1")(h), train))
        h = nn.relu(BN(d, name="bn2")(PLinear(128, d, name="conv2")(h), train))
        h = BN(d, name="bn3")(
            PLinear(self.output_size, d, name="conv3")(h), train
        )

        if self.num_scales > 1:
            # (output_size -> output_size*num_scales) expansion, then pool
            # each scale segment (reference model.py:207-230)
            h = BN(d, name="bn4")(
                PLinear(self.output_size * self.num_scales, d,
                        name="conv4")(nn.relu(h)), train
            )

        if self.sym_op not in ("max", "sum"):
            raise ValueError(f"Unsupported symmetric operation: {self.sym_op}")
        h = _scale_pool(h, self.num_scales, self.sym_op)

        return h, trans, trans_quat, trans2
