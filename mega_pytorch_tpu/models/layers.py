"""Shared NN layers."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm2d(nn.Module):
    """BatchNorm with fixed statistics and affine parameters.

    Parity with mega_core/layers/batch_norm.py:6-31: ``x * scale + bias`` where
    ``scale = weight * rsqrt(running_var)`` (note: NO eps) and
    ``bias = bias - running_mean * scale``. All four tensors are buffers in the
    reference (never trained); here they live in "params" and the solver masks
    them out of the optimizer (see solver/build.py).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = weight / jnp.sqrt(var)
        shift = bias - mean * scale
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


class DeformRoIPooling(nn.Module):
    """Deformable PSROI pooling (mega_core/layers/dcn/deform_pool_module.py:6-33).

    Thin module over ops.deform_pool.deform_roi_pooling; ``no_trans=True``
    ignores the offset argument like the reference."""

    spatial_scale: float
    out_size: int
    out_channels: int
    no_trans: bool
    group_size: int = 1
    part_size: int | None = None
    sample_per_part: int = 4
    trans_std: float = 0.0

    def __call__(self, data, rois, offset=None):
        from ..ops.deform_pool import deform_roi_pooling

        return deform_roi_pooling(
            data, rois, None if self.no_trans else offset,
            self.spatial_scale, self.out_size, self.out_channels,
            self.no_trans, self.group_size, self.part_size,
            self.sample_per_part, self.trans_std,
        )


class DeformRoIPoolingPack(nn.Module):
    """deform_pool_module.py:36-88: a no-trans pooling pass feeds a 3-layer
    offset MLP (zero-init final layer: starts exactly at plain PSROI pooling),
    whose (R, 2, p, p) offsets drive the deformable second pass."""

    spatial_scale: float
    out_size: int
    out_channels: int
    no_trans: bool
    group_size: int = 1
    part_size: int | None = None
    sample_per_part: int = 4
    trans_std: float = 0.0
    deform_fc_channels: int = 1024

    @nn.compact
    def __call__(self, data, rois):
        from ..ops.deform_pool import deform_roi_pooling

        pool = lambda off, nt: deform_roi_pooling(  # noqa: E731
            data, rois, off, self.spatial_scale, self.out_size,
            self.out_channels, nt, self.group_size, self.part_size,
            self.sample_per_part, self.trans_std,
        )
        if self.no_trans:
            return pool(None, True)
        n = rois.shape[0]
        p = self.out_size
        x = pool(None, True).reshape(n, -1)
        x = nn.relu(nn.Dense(self.deform_fc_channels, name="offset_fc0")(x))
        x = nn.relu(nn.Dense(self.deform_fc_channels, name="offset_fc1")(x))
        off = nn.Dense(
            p * p * 2, name="offset_fc2",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(x).reshape(n, 2, p, p)
        return pool(off, False)


class ModulatedDeformRoIPoolingPack(nn.Module):
    """deform_pool_module.py:91-155: DeformRoIPoolingPack plus a sigmoid mask
    MLP (zero-init: starts at mask 0.5) multiplied onto the pooled output."""

    spatial_scale: float
    out_size: int
    out_channels: int
    no_trans: bool
    group_size: int = 1
    part_size: int | None = None
    sample_per_part: int = 4
    trans_std: float = 0.0
    deform_fc_channels: int = 1024

    @nn.compact
    def __call__(self, data, rois):
        from ..ops.deform_pool import deform_roi_pooling

        pool = lambda off, nt: deform_roi_pooling(  # noqa: E731
            data, rois, off, self.spatial_scale, self.out_size,
            self.out_channels, nt, self.group_size, self.part_size,
            self.sample_per_part, self.trans_std,
        )
        if self.no_trans:
            return pool(None, True)
        n = rois.shape[0]
        p = self.out_size
        x = pool(None, True).reshape(n, -1)
        h = nn.relu(nn.Dense(self.deform_fc_channels, name="offset_fc0")(x))
        h = nn.relu(nn.Dense(self.deform_fc_channels, name="offset_fc1")(h))
        off = nn.Dense(
            p * p * 2, name="offset_fc2",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(h).reshape(n, 2, p, p)
        m = nn.relu(nn.Dense(self.deform_fc_channels, name="mask_fc0")(x))
        mask = nn.sigmoid(nn.Dense(
            p * p, name="mask_fc1",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(m)).reshape(n, p, p, 1)
        return pool(off, False) * mask
