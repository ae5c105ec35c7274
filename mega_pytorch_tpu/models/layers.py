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
