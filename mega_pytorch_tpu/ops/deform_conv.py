"""Deformable convolution v1/v2 (gather-free bilinear-warp formulation).

Parity with mega_core/csrc/cuda/deform_conv_cuda.cu (+ the modulated v2 in
deform_pool/deform_conv kernels, exposed as layers/dcn DFConv2d): each kernel
tap k samples the input at ``p + p_k·dilation + Δp_k(p)`` bilinearly, scaled
by the modulation mask m_k(p) (v2), then contracts with the tap's weights.

TPU design: instead of im2col gathers, every tap is one bilinear warp of the
whole feature map (ops/warp.py math) followed by a 1x1 contraction — K warps
+ K matmuls, which XLA pipelines on the MXU. Off by default in every VID
config (MODEL.RESNETS.STAGE_WITH_DCN all False); zoo completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .warp import bilinear_sample


def deform_conv2d(
    x: jnp.ndarray,  # (H, W, Cin)
    offsets: jnp.ndarray,  # (H, W, 2 * K) — (dy, dx) per tap, torch order
    weight: jnp.ndarray,  # (kh, kw, Cin, Cout)
    mask: jnp.ndarray | None = None,  # (H, W, K) modulation (v2)
    dilation: int = 1,
) -> jnp.ndarray:
    """Stride-1, same-padding deformable conv over one image."""
    kh, kw, cin, cout = weight.shape
    k = kh * kw
    h, w = x.shape[0], x.shape[1]
    out = jnp.zeros((h, w, cout), jnp.float32)
    grid_y, grid_x = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    for t in range(k):
        dy = (t // kw - kh // 2) * dilation
        dx = (t % kw - kw // 2) * dilation
        # torch layout: offsets channel 2t = Δy, 2t+1 = Δx. Deform conv
        # addresses pixels absolutely (p + p_k + Δp) — raw coordinates, no
        # grid_sample normalization (unlike the flow-warp path).
        sampled = bilinear_sample(
            x.astype(jnp.float32),
            grid_x + (offsets[..., 2 * t + 1] + dx),
            grid_y + (offsets[..., 2 * t] + dy),
        )
        if mask is not None:
            sampled = sampled * mask[..., t : t + 1]
        out = out + sampled @ weight[t // kw, t % kw].astype(jnp.float32)
    return out


class DFConv2d(nn.Module):
    """Deformable conv layer: an internal conv predicts offsets (and the v2
    modulation mask, sigmoid'd ×2 like the reference layers/dcn modules)."""

    features: int
    kernel_size: int = 3
    dilation: int = 1
    with_modulated_dcn: bool = False
    deformable_groups: int = 1  # offset channels replicate per group
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, Cin) → (B, H, W, features), stride 1."""
        k = self.kernel_size * self.kernel_size
        off_ch = self.deformable_groups * (3 if self.with_modulated_dcn else 2) * k
        raw = nn.Conv(
            off_ch,
            (self.kernel_size, self.kernel_size),
            padding=[(self.dilation * (self.kernel_size // 2),) * 2] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="offset",
        )(x.astype(self.dtype)).astype(jnp.float32)

        g = self.deformable_groups
        if self.with_modulated_dcn:
            per = raw.reshape(*raw.shape[:-1], g, 3 * k)
            offsets = per[..., : 2 * k]
            mask = 2.0 * jax.nn.sigmoid(per[..., 2 * k :])
        else:
            offsets = raw.reshape(*raw.shape[:-1], g, 2 * k)
            mask = None

        weight = self.param(
            "kernel",
            nn.initializers.he_uniform(),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
        )
        cin = x.shape[-1]
        assert cin % g == 0
        cg = cin // g

        def one_image(xi, offs, msk):
            outs = []
            for gi in range(g):
                outs.append(
                    deform_conv2d(
                        xi[..., gi * cg : (gi + 1) * cg],
                        offs[..., gi, :],
                        weight[:, :, gi * cg : (gi + 1) * cg, :],
                        None if msk is None else msk[..., gi, :],
                        self.dilation,
                    )
                )
            return sum(outs)

        if mask is None:
            return jax.vmap(lambda xi, o: one_image(xi, o, None))(x, offsets)
        return jax.vmap(one_image)(x, offsets, mask)
