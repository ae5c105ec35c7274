"""Relation attention for RDN/MEGA (masked, fixed-shape, MXU-friendly).

Parity with the reference AttentionExtractor machinery
(mega_core/modeling/roi_heads/box_head/roi_box_feature_extractors.py):
  * extract_position_matrix (:146-176) — pairwise log-ratio geometry.
  * extract_position_embedding (:125-144) — sinusoidal encoding of the 4
    geometry channels (feat_dim/8 frequencies, wave length 1000, x100 scale).
  * attention_module_multi_head (:178-238 and the MEGA variant :567-646) —
    16-group attention whose logits are scaled content affinity
    (+ optional global `u·K` bias, MEGA) plus the log of a learned position
    weight; values are the full 1024-d ref features per group, mixed back to
    1024 by a grouped 1x1 (here a per-group (1024, 64) matmul).

TPU changes: everything is einsum on padded tensors; invalid reference slots
are masked to -inf before the softmax (the reference never pads). On TPU the
position bias — geometry → sinusoids → Wg → relu → log — runs as one fused
Pallas kernel (ops/pallas/position_bias.py), never materializing the
(N, M, 64) embedding that dominates HBM traffic in the streaming pipeline.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.pallas.position_bias import fused_position_bias, reference_position_bias
from ...ops.pallas.relation_attention import (
    fused_relation_attention,
    fused_relation_attention_pos,
)

NEG_INF = -1e30

# flash kernel pays off once the (g, N, M) logits tensor stops fitting the
# fusion budget; below this M the plain einsum path is as fast and simpler
FUSED_MIN_REFS = 512


def extract_position_matrix(bbox: jnp.ndarray, ref_bbox: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) → (N, M, 4) [log|dx/w|, log|dy/h|, log(w/w'), log(h/h')]."""
    def parts(b):
        w = b[:, 2] - b[:, 0] + 1.0
        h = b[:, 3] - b[:, 1] + 1.0
        cx = 0.5 * (b[:, 0] + b[:, 2])
        cy = 0.5 * (b[:, 1] + b[:, 3])
        return jnp.maximum(w, 1e-3), jnp.maximum(h, 1e-3), cx, cy

    w, h, cx, cy = parts(bbox)
    w_r, h_r, cx_r, cy_r = parts(ref_bbox)

    delta_x = jnp.log(jnp.abs((cx[:, None] - cx_r[None, :]) / w[:, None]) + 1e-3)
    delta_y = jnp.log(jnp.abs((cy[:, None] - cy_r[None, :]) / h[:, None]) + 1e-3)
    delta_w = jnp.log(w[:, None] / w_r[None, :])
    delta_h = jnp.log(h[:, None] / h_r[None, :])
    return jnp.stack([delta_x, delta_y, delta_w, delta_h], axis=2)


def extract_position_embedding(
    position_mat: jnp.ndarray, feat_dim: int = 64, wave_length: float = 1000.0
) -> jnp.ndarray:
    """(N, M, 4) → (N, M, feat_dim) sinusoidal embedding."""
    num_freq = feat_dim // 8
    freq = jnp.arange(num_freq, dtype=jnp.float32)
    dim_mat = wave_length ** (8.0 / feat_dim * freq)  # (F,)
    div = (position_mat[..., None] * 100.0) / dim_mat  # (N, M, 4, F)
    emb = jnp.concatenate([jnp.sin(div), jnp.cos(div)], axis=-1)  # (N, M, 4, 2F)
    return emb.reshape(*position_mat.shape[:2], feat_dim)


def position_embedding(rois: jnp.ndarray, ref_rois: jnp.ndarray, feat_dim: int = 64):
    """cal_position_embedding (:240-250), laid out (N, M, feat_dim)."""
    return extract_position_embedding(
        extract_position_matrix(rois, ref_rois), feat_dim
    )


class RelationAttention(nn.Module):
    """One stage of multi-head relation attention.

    use_position: learn the Wg position-bias branch (local/memory attention);
    callers pass ``pos_rois=(cur_rois, ref_rois)`` and the bias is computed
    internally (fused Pallas on TPU, plain XLA elsewhere).
    use_u_bias: add the global content bias `u @ K^T` (MEGA; RDN omits it).
    """

    feat_dim: int = 1024
    embed_dim: int = 64
    groups: int = 16
    use_position: bool = True
    use_u_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    def _wg(self):
        g = self.groups

        def init(key):
            kk, _ = jax.random.split(key)
            return {
                "kernel": nn.initializers.normal(0.01)(kk, (self.embed_dim, g)),
                "bias": jnp.zeros((g,), jnp.float32),
            }

        return self.param("Wg", init)

    @nn.compact
    def __call__(
        self,
        roi_feat: jnp.ndarray,
        ref_feat: jnp.ndarray,
        ref_valid: jnp.ndarray | None = None,
        pos_rois: tuple | None = None,
        pos_emb: jnp.ndarray | None = None,
        precise_bias: bool = False,
    ) -> jnp.ndarray:
        """roi_feat (N, D), ref_feat (M, D), ref_valid (M,),
        pos_rois = (cur_rois (N, 4), ref_rois (M, 4)) or pos_emb (N, M, E).

        precise_bias: compute the position-bias sinusoid contraction in fp32.
        REQUIRED on paths that will be differentiated (training): the bf16
        inference default corrupts d bias/dWg at the relu boundary (see
        reference_position_bias docstring) while leaving forward values, and
        hence losses, untouched."""
        g = self.groups
        d = self.feat_dim // g
        dt = self.dtype
        m = ref_feat.shape[0]

        q = nn.Dense(self.feat_dim, dtype=dt, name="Wq")(roi_feat.astype(dt))
        k = nn.Dense(self.feat_dim, dtype=dt, name="Wk")(ref_feat.astype(dt))
        q = q.reshape(-1, g, d)
        k = k.reshape(-1, g, d)

        if self.use_u_bias:
            u = self.param(
                "u", nn.initializers.normal(0.01), (g, self.embed_dim)
            )
            uk = jnp.einsum(
                "gd,mgd->gm", u.astype(dt), k, preferred_element_type=jnp.float32
            )
        else:
            uk = None

        use_flash = jax.default_backend() == "tpu" and m >= FUSED_MIN_REFS
        log_bias = None
        bias_in_kernel = False
        if self.use_position:
            wg = self._wg()
            if pos_rois is not None and use_flash:
                # flash pos path evaluates the bias per tile inside the
                # attention kernel (per-row MXU contraction): neither the
                # bias nor the logits ever exist in HBM — measured 4.2 ms vs
                # 6.7 ms for XLA-bias + input-bias flash at stage-0 shapes
                bias_in_kernel = True
            elif pos_rois is not None:
                # XLA path: the (c, f) einsum fuses without materializing
                # the (N, M, 64) embedding
                log_bias = reference_position_bias(
                    pos_rois[0], pos_rois[1], wg["kernel"], wg["bias"],
                    self.embed_dim,
                    sin_dtype=jnp.float32 if precise_bias else jnp.bfloat16,
                )
            else:
                assert pos_emb is not None
                pw = jnp.maximum(
                    pos_emb.astype(jnp.float32) @ wg["kernel"] + wg["bias"], 0.0
                )
                log_bias = jnp.log(pw + 1e-6).transpose(2, 0, 1)

        wv = self.param(
            "Wv_kernel",
            nn.initializers.normal(0.01),
            (g, self.feat_dim, d),
        )
        bv = self.param("Wv_bias", nn.initializers.zeros, (self.feat_dim,))
        # The reference computes out[n,g,:] = Σ_m soft·ref_feat (full 1024-d
        # values) and THEN the grouped 1x1 Wv mix (attention_module_multi_head's
        # output_t → linear_out_1 conv). Reassociating the two linear ops —
        # project each ref to its per-group d-dim value first, then attend —
        # is mathematically identical and cuts the AV FLOPs by feat_dim/d
        # (16x fewer MACs in the N×M contraction; 6.5x overall at MEGA
        # stage-0 shapes), keeping the MXU matmuls large either way.
        v = jnp.einsum(
            "mf,gfd->mgd",
            ref_feat.astype(dt),
            wv.astype(dt),
            preferred_element_type=jnp.float32,
        )  # (M, g, D)

        if use_flash:
            # flash path: the (g, N, M) logits live only in VMEM tiles
            valid = (
                ref_valid if ref_valid is not None
                else jnp.ones((m,), bool)
            )
            qt, kt, vt = (
                q.transpose(1, 0, 2), k.transpose(1, 0, 2), v.transpose(1, 0, 2)
            )
            ukt = uk if uk is not None else jnp.zeros((g, m), jnp.float32)
            if bias_in_kernel:
                out = fused_relation_attention_pos(
                    qt, kt, vt, ukt, pos_rois[0],
                    (pos_rois[1], wg["kernel"], wg["bias"]), valid,
                    self.embed_dim,
                )
            else:
                out = fused_relation_attention(qt, kt, vt, ukt, log_bias, valid)
            return out.transpose(1, 0, 2).reshape(-1, self.feat_dim) + bv

        aff = jnp.einsum(
            "ngd,mgd->gnm", q, k, preferred_element_type=jnp.float32
        )
        if uk is not None:
            aff = aff + uk[:, None, :]
        aff = aff * (1.0 / math.sqrt(d))
        if log_bias is not None:
            aff = log_bias + aff

        if ref_valid is not None:
            aff = jnp.where(ref_valid[None, None, :], aff, NEG_INF)
        soft = jax.nn.softmax(aff, axis=2)  # (g, N, M)
        if ref_valid is not None:
            # with zero valid refs the softmax is uniform garbage — emit zeros
            # (an empty attention contributes nothing to the residual)
            soft = jnp.where(ref_valid.any(), soft, 0.0)

        mixed = jnp.einsum(
            "gnm,mgd->ngd",
            soft.astype(dt),
            v.astype(dt),
            preferred_element_type=jnp.float32,
        ).reshape(-1, self.feat_dim)
        return mixed + bv
