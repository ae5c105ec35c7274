"""MEGA feature extractor: global-local aggregation + long-range memory.

Parity with MEGAFeatureExtractor (roi_box_feature_extractors.py:457-933):
  * local/memory attention — position-bias relation attention with the `u`
    content bias (attention_module_multi_head :567-646), weights l_* per stage.
  * global attention — content-only (+u) attention onto a cache of global
    frame ROI features (update_lm :690-699), weights g_* (global_res_stage+1
    sets: index 0 enhances features as they are created, 1.. are residual
    stages after the local stack).
  * training (:831-881) — memory pool enhanced and distilled under
    stop-gradient with a stage-wise self-enhancement recurrence whose
    intermediate refs become per-stage memories; local stack attends to
    [local refs ⊕ mem[i]] per stage; key/distilled feature routing between
    stages follows :863-878.
  * streaming test (:898-933) — per-stage Long Range Memory ring buffers are
    pushed with the OLDEST cached frame's refs before each stage's attention
    (update_memory :678-688), extending temporal context by ~memory_size
    frames at O(1) cost.

All ragged deques become fixed-shape buffers + validity masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.roi_align import roi_align
from ..backbone.resnet import ResNetRes5Head
from .attention import RelationAttention


class RefSet(NamedTuple):
    """A padded set of reference ROIs with features."""

    rois: jnp.ndarray  # (M, 4)
    feats: jnp.ndarray  # (M, D)
    valid: jnp.ndarray  # (M,)


def cat_refs(a: RefSet, b: RefSet) -> RefSet:
    return RefSet(
        rois=jnp.concatenate([a.rois, b.rois], 0),
        feats=jnp.concatenate([a.feats, b.feats], 0),
        valid=jnp.concatenate([a.valid, b.valid], 0),
    )


class MEGAFeatureExtractor(nn.Module):
    depth: str = "R-101"
    reduce_channel: bool = False
    resolution: int = 7
    spatial_scale: float = 1.0 / 16
    sampling_ratio: int = 0
    mlp_dim: int = 1024
    dilation: int = 2
    stride_in_1x1: bool = True
    norm: str = "frozen_bn"
    stage: int = 3
    base_num: int = 75
    advanced_num: int = 15
    embed_dim: int = 64
    groups: int = 16
    global_enable: bool = True
    global_res_stage: int = 1
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
        self.l_fcs = [
            nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"l_fcs_{i}")
            for i in range(self.stage)
        ]
        self.l_attn = [
            RelationAttention(
                feat_dim=self.mlp_dim,
                embed_dim=self.embed_dim,
                groups=self.groups,
                use_position=True,
                use_u_bias=True,
                dtype=self.dtype,
                name=f"l_attn_{i}",
            )
            for i in range(self.stage)
        ]
        if self.global_enable:
            self.g_attn = [
                RelationAttention(
                    feat_dim=self.mlp_dim,
                    embed_dim=self.embed_dim,
                    groups=self.groups,
                    use_position=False,
                    use_u_bias=True,
                    dtype=self.dtype,
                    name=f"g_attn_{i}",
                )
                for i in range(self.global_res_stage + 1)
            ]

    # -- shared plumbing ------------------------------------------------------
    def enhance_features(self, c4: jnp.ndarray) -> jnp.ndarray:
        x = self.head(c4)
        if self.reduce_channel:
            x = nn.relu(self.conv(x))
        return x

    def pool_flat(self, feat_map: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
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
        return nn.relu(self.l_fcs[0](flat.astype(self.dtype)).astype(jnp.float32))

    def _distill(self, arr: jnp.ndarray, frames: int) -> jnp.ndarray:
        """Top advanced_num of each base_num block (score-ordered slots)."""
        return arr.reshape(frames, self.base_num, *arr.shape[1:])[
            :, : self.advanced_num
        ].reshape(frames * self.advanced_num, *arr.shape[1:])

    def update_lm(
        self,
        feats: jnp.ndarray,
        g_feats: jnp.ndarray,
        g_valid: jnp.ndarray,
        index: int = 0,
    ) -> jnp.ndarray:
        """Global enhancement (update_lm :690-699): content-only attention."""
        return feats + self.g_attn[index](feats, g_feats, g_valid)

    def _local_attend(
        self,
        i: int,
        cur_rois: jnp.ndarray,
        cur_feats: jnp.ndarray,
        refs: RefSet,
        last: bool,
        precise: bool = False,
    ) -> jnp.ndarray:
        """One local/memory stage (_forward_*_single): attention + residual
        (+ next-stage fc unless last). precise=True on differentiated (train)
        paths — fp32 position-bias contraction, see RelationAttention."""
        att = self.l_attn[i](
            cur_feats, refs.feats, refs.valid, pos_rois=(cur_rois, refs.rois),
            precise_bias=precise,
        )
        feats = cur_feats + att
        if not last:
            feats = nn.relu(
                self.l_fcs[i + 1](feats.astype(self.dtype)).astype(jnp.float32)
            )
        return feats

    # -- training ----------------------------------------------------------------
    def extract_train(
        self,
        maps_l: jnp.ndarray,  # (1+L, h, w, 1024): cur first
        maps_m: jnp.ndarray,  # (M, h, w, 1024)
        maps_g: jnp.ndarray,  # (G, h, w, 1024)
        key_rois: jnp.ndarray,  # (N, 4) subsampled on cur
        l_rois: jnp.ndarray, l_valid: jnp.ndarray,  # (1+L, 75, 4) / (1+L, 75)
        m_rois: jnp.ndarray, m_valid: jnp.ndarray,  # (M, 75, ...)
        g_rois: jnp.ndarray, g_valid: jnp.ndarray,  # (G, 75, ...)
    ) -> jnp.ndarray:
        a = self.advanced_num

        # 1. global pool (differentiable)
        if self.global_enable:
            enhanced_g = self.enhance_features(maps_g)
            g_flat = jax.vmap(self.pool_flat)(enhanced_g, g_rois)
            g_feats = self.fc0(g_flat.reshape(-1, g_flat.shape[-1]))
            g_val = g_valid.reshape(-1)
        else:
            g_feats = g_val = None

        # 2. memory pool (entirely stop-gradient, generalized via the
        #    extractor-level no_grad at :831-840)
        fm = m_rois.shape[0]
        enhanced_m = self.enhance_features(maps_m)
        m_flat = jax.vmap(self.pool_flat)(enhanced_m, m_rois)
        x_m = self.fc0(m_flat.reshape(fm * self.base_num, -1))
        if self.global_enable:
            x_m = self.update_lm(x_m, g_feats, g_val)
        m_rois_flat = m_rois.reshape(-1, 4)
        m_val_flat = m_valid.reshape(-1)
        m_rois_dis = self._distill(m_rois_flat, fm)
        m_val_dis = self._distill(m_val_flat, fm)
        x_m_dis = self._distill(x_m, fm)

        # stage-wise memory self-enhancement (:848-860)
        mem: list[RefSet] = [RefSet(m_rois_flat, x_m, m_val_flat)]
        feats = x_m_dis
        for i in range(self.stage - 1):
            feats = self._local_attend(
                i, m_rois_dis, feats, mem[i], last=False, precise=True
            )
            mem.append(RefSet(m_rois_dis, feats, m_val_dis))
        mem = [
            RefSet(r.rois, jax.lax.stop_gradient(r.feats), r.valid) for r in mem
        ]

        # 3. local pool
        fl = l_rois.shape[0]
        enhanced_l = self.enhance_features(maps_l)
        x_key = self.fc0(self.pool_flat(enhanced_l[0], key_rois))
        l_flat = jax.vmap(self.pool_flat)(enhanced_l, l_rois)
        x_l = self.fc0(l_flat.reshape(fl * self.base_num, -1))
        if self.global_enable:
            # one merged call (update_lm is per-row; see extract_test)
            both = self.update_lm(
                jnp.concatenate([x_key, x_l], 0), g_feats, g_val
            )
            x_key, x_l = both[: x_key.shape[0]], both[x_key.shape[0]:]
        l_rois_flat = l_rois.reshape(-1, 4)
        l_val_flat = l_valid.reshape(-1)
        rois_dis = self._distill(l_rois_flat, fl)
        val_dis = self._distill(l_val_flat, fl)
        x_dis = self._distill(x_l, fl)

        n_key = key_rois.shape[0]
        cur_rois_full = jnp.concatenate([key_rois, rois_dis], 0)
        feats = jnp.concatenate([x_key, x_dis], 0)

        # 4. local stack (:863-878)
        for i in range(self.stage):
            last = i == self.stage - 1
            if i == 0:
                refs = RefSet(l_rois_flat, x_l, l_val_flat)
                cur_rois = cur_rois_full
            elif not last:
                refs = RefSet(rois_dis, feats[n_key:], val_dis)
                cur_rois = cur_rois_full
            else:
                refs = RefSet(rois_dis, feats[n_key:], val_dis)
                cur_rois = key_rois
                feats = feats[:n_key]
            refs = cat_refs(refs, mem[i])
            feats = self._local_attend(
                i, cur_rois, feats, refs, last=last, precise=True
            )

        x = feats
        # 5. global residual stages (:880-881)
        if self.global_enable:
            for i in range(self.global_res_stage):
                x = self.update_lm(x, g_feats, g_val, index=i + 1)
        return x

    # -- streaming test ---------------------------------------------------------
    def precompute_ref(self, c4: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        """_forward_ref (:883-896): pooled + fc0 features for the caches."""
        return self.fc0(self.pool_flat(self.enhance_features(c4[None])[0], rois))

    def extract_test(
        self,
        x: jnp.ndarray,  # (K, D) key-frame ROI features (pooled+fc0 at entry)
        cur_rois: jnp.ndarray,  # (K, 4)
        window: RefSet,  # (T*75, ...) cached local refs (fc0 features)
        lrm: tuple,  # per-stage RefSet ring buffers, flattened (S*75 / S*15)
        g_feats: jnp.ndarray, g_valid: jnp.ndarray,  # (Gsize*75, ...)
    ):
        """Returns (x, lrm_pushes) where lrm_pushes[i] is the RefSet pushed
        into memory stage i this frame (the oldest cached refs, :678-688).

        TPU redesign vs the reference (:898-933): the reference re-runs res5 +
        pooling on the key map here; we precompute the key ROI features when
        the frame enters the window (identical values — the computation is
        deterministic — at one res5 pass per frame instead of two)."""
        t = window.rois.shape[0] // self.base_num

        if self.global_enable:
            # ONE merged global-enhance call for the key set and the window
            # (update_lm is per-row content attention, so enhance(concat) ==
            # concat(enhance)), and the distilled subset is sliced from the
            # enhanced window (enhance(distill(f)) == distill(enhance(f)) —
            # _distill selects rows) instead of re-attended: 3 attention
            # calls -> 1 and the 375 distilled rows' work disappears.
            # Identical math to update_lm-ing x / x_ref / x_ref_dis apart
            # (reference update_lm :690-699 is row-independent).
            n_q = x.shape[0]
            both = self.update_lm(
                jnp.concatenate([x, window.feats], 0), g_feats, g_valid
            )
            x, x_ref = both[:n_q], both[n_q:]
            x_ref_dis = self._distill(x_ref, t)
        else:
            x_ref = window.feats
            x_ref_dis = self._distill(window.feats, t)

        rois_dis = self._distill(window.rois, t)
        val_dis = self._distill(window.valid, t)
        n_key = cur_rois.shape[0]

        cur_rois_full = jnp.concatenate([cur_rois, rois_dis], 0)
        feats = jnp.concatenate([x, x_ref_dis], 0)

        pushes = []
        for i in range(self.stage):
            last = i == self.stage - 1
            if i == 0:
                refs = RefSet(window.rois, x_ref, window.valid)
                cur_r = cur_rois_full
                push_n = self.base_num
            elif not last:
                refs = RefSet(rois_dis, feats[n_key:], val_dis)
                cur_r = cur_rois_full
                push_n = self.advanced_num
            else:
                refs = RefSet(rois_dis, feats[n_key:], val_dis)
                cur_r = cur_rois
                feats = feats[:n_key]
                push_n = self.advanced_num
            # update_memory pushes the OLDEST frame's refs (refs[:push_n])
            pushes.append(
                RefSet(
                    refs.rois[:push_n], refs.feats[:push_n], refs.valid[:push_n]
                )
            )
            refs = cat_refs(refs, lrm[i])
            feats = self._local_attend(i, cur_r, feats, refs, last=last)

        x = feats
        if self.global_enable:
            for i in range(self.global_res_stage):
                x = self.update_lm(x, g_feats, g_valid, index=i + 1)
        return x, tuple(pushes)
