"""Video feature extractors: RDN relation distillation (and shared plumbing).

Parity with RDNFeatureExtractor (roi_box_feature_extractors.py:253-454):
res5-on-map (+optional reduce), ROIAlign, then fc/attention stages over the
current frame's ROIs attending to reference-frame ROIs, with an optional
"advanced" distillation stage over the top ``advanced_num`` refs per frame
(relies on NMS emitting boxes score-descending, which ours does).

Weight-list naming: torch uses ModuleLists (fcs.0, Wgs.0, ...); here stage i
lives under ``fcs_{i}`` / ``attn_{i}`` (Wg/Wq/Wk/Wv inside RelationAttention)
— checkpoint ingestion maps the names mechanically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.roi_align import roi_align
from ..backbone.resnet import ResNetRes5Head
from .attention import RelationAttention


class RDNFeatureExtractor(nn.Module):
    depth: str = "R-101"
    reduce_channel: bool = False
    resolution: int = 7
    spatial_scale: float = 1.0 / 16
    sampling_ratio: int = 0
    mlp_dim: int = 1024
    dilation: int = 2
    stride_in_1x1: bool = True
    norm: str = "frozen_bn"
    base_stage: int = 2
    advanced_stage: int = 0
    base_num: int = 75  # REF_POST_NMS_TOP_N
    advanced_num: int = 15  # base_num * RDN.RATIO
    embed_dim: int = 64
    groups: int = 16
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.mlp_dim

    def setup(self):
        self.head = ResNetRes5Head(
            depth=self.depth,
            stride_init=1,
            dilation=self.dilation,
            stride_in_1x1=self.stride_in_1x1,
            norm=self.norm,
            dtype=self.dtype,
            name="head",
        )
        if self.reduce_channel:
            self.conv = nn.Conv(256, (1, 1), dtype=self.dtype, name="conv")
        # module-list sizing follows the reference loop
        # (roi_box_feature_extractors.py:314-331): with advanced_stage == 0
        # there are base_stage fcs/attns; otherwise base+adv fcs and
        # base+adv+1 attns.
        if self.advanced_stage == 0:
            n_fc, n_attn = self.base_stage, self.base_stage
        else:
            n_fc = self.base_stage + self.advanced_stage
            n_attn = self.base_stage + self.advanced_stage + 1
        self.fcs = [
            nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"fcs_{i}")
            for i in range(n_fc)
        ]
        self.attn = [
            RelationAttention(
                feat_dim=self.mlp_dim,
                embed_dim=self.embed_dim,
                groups=self.groups,
                use_position=True,
                use_u_bias=False,
                dtype=self.dtype,
                name=f"attn_{i}",
            )
            for i in range(n_attn)
        ]

    # -- plumbing shared with the base extractor ---------------------------
    def enhance_features(self, c4: jnp.ndarray) -> jnp.ndarray:
        x = self.head(c4)
        if self.reduce_channel:
            x = nn.relu(self.conv(x))
        return x

    def pool_flat(self, feat_map: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        """feat_map (H, W, C), rois (R, 4) → (R, C*res*res) float32."""
        pooled = roi_align(
            feat_map.astype(jnp.float32),
            rois,
            self.spatial_scale,
            self.resolution,
            self.resolution,
            self.sampling_ratio,
        )
        return pooled.reshape(rois.shape[0], -1)

    def fc0(self, flat: jnp.ndarray) -> jnp.ndarray:
        return nn.relu(self.fcs[0](flat.astype(self.dtype)).astype(jnp.float32))

    # -- attention flows ----------------------------------------------------
    def _stages(
        self,
        x: jnp.ndarray,
        x_refs: jnp.ndarray,
        cur_rois: jnp.ndarray,
        ref_rois: jnp.ndarray,
        ref_valid: jnp.ndarray,
        skip_first_fc: bool = False,
        precise: bool = False,
    ) -> jnp.ndarray:
        """Base attention stages + optional advanced distillation stage.

        x: (N, S) raw pooled-flat current features (fc applied inside, like
        the reference's per-stage `relu(fcs[i](x))`), or — with
        skip_first_fc — features with fcs[0] already applied (streaming
        caches store fc0'd features to keep the carry small).
        x_refs: (M, 1024) fc0'd reference features, M = T * base_num.
        """
        for i in range(self.base_stage):
            if not (skip_first_fc and i == 0):
                x = nn.relu(self.fcs[i](x.astype(self.dtype)).astype(jnp.float32))
            x = x + self.attn[i](
                x, x_refs, ref_valid, pos_rois=(cur_rois, ref_rois),
                precise_bias=precise,
            )

        if self.advanced_stage > 0:
            t = x_refs.shape[0] // self.base_num
            a = self.advanced_num

            def top_slice(arr):
                return arr.reshape(t, self.base_num, *arr.shape[1:])[:, :a].reshape(
                    t * a, *arr.shape[1:]
                )

            refs_adv = top_slice(x_refs)
            rois_adv = top_slice(ref_rois)
            valid_adv = top_slice(ref_valid)

            for i in range(self.advanced_stage):
                j = self.base_stage + i
                att = self.attn[j](
                    refs_adv, x_refs, ref_valid, pos_rois=(rois_adv, ref_rois),
                    precise_bias=precise,
                )
                refs_adv = nn.relu(
                    self.fcs[j]((refs_adv + att).astype(self.dtype)).astype(jnp.float32)
                )
            x = x + self.attn[self.base_stage + self.advanced_stage](
                x, refs_adv, valid_adv, pos_rois=(cur_rois, rois_adv),
                precise_bias=precise,
            )
        return x

    # -- entry points ---------------------------------------------------------
    def extract_train(
        self,
        maps: jnp.ndarray,  # (F, H, W, 1024) C4 maps; frame 0 is current
        key_rois: jnp.ndarray,  # (N, 4) subsampled proposals on frame 0
        ref_rois: jnp.ndarray,  # (F, base_num, 4) ref-RPN proposals per frame
        ref_valid: jnp.ndarray,  # (F, base_num)
    ) -> jnp.ndarray:
        enhanced = self.enhance_features(maps)
        x = self.pool_flat(enhanced[0], key_rois)
        refs_flat = jax.vmap(self.pool_flat)(enhanced, ref_rois)
        f = ref_rois.shape[0]
        x_refs = self.fc0(refs_flat.reshape(f * self.base_num, -1))
        return self._stages(
            x,
            x_refs,
            key_rois,
            ref_rois.reshape(f * self.base_num, 4),
            ref_valid.reshape(f * self.base_num),
            precise=True,
        )

    def precompute_ref(self, c4: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        """_forward_ref (:399-410): per-frame pooled + fc0 features for the
        streaming cache. c4: (H, W, 1024); rois: (R, 4) → (R, 1024)."""
        return self.fc0(self.pool_flat(self.enhance_features(c4[None])[0], rois))

    def extract_test(
        self,
        x: jnp.ndarray,  # (K, 1024) key-frame ROI features, fcs[0] applied
        cur_rois: jnp.ndarray,  # (K, 4) key-frame proposals
        ref_rois: jnp.ndarray,  # (M, 4) all cached ref rois (T*base_num)
        ref_valid: jnp.ndarray,  # (M,)
        ref_feats: jnp.ndarray,  # (M, 1024) cached fc0'd features
    ) -> jnp.ndarray:
        return self._stages(
            x, ref_feats, cur_rois, ref_rois, ref_valid, skip_first_fc=True
        )
