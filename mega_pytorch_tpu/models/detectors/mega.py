"""MEGA meta-architecture (Memory Enhanced Global-Local Aggregation).

Parity with mega_core/modeling/detector/generalized_rcnn_mega.py:21-225:
  train — three frame pools: local (cur + REF_NUM_LOCAL), memory
  (REF_NUM_MEM, stop-gradient), global (REF_NUM_GLOBAL); key RPN on cur,
  ref RPN (75) everywhere; MEGAFeatureExtractor does the aggregation.

  test — streaming with a 25-slot local window (key at slot 12), per-stage
  Long Range Memory ring buffers, and a 10-slot global feature cache fed by
  the dataset's shuffled global frame schedule. All deques become fixed-shape
  ring buffers in an explicit ``MEGACarry``; the engine owns IO/warmup.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...structures.image_list import ImageBatch
from ..backbone.resnet import ResNetC4
from ..roi_heads.inference import Detections, postprocess_detections
from ..roi_heads.mega_extractor import MEGAFeatureExtractor, RefSet
from ..roi_heads.predictors import FPNPredictor
from ..roi_heads.subsample import fastrcnn_loss, subsample_proposals
from ..rpn.anchors import generate_cell_anchors, grid_anchors
from ..rpn.rpn import (
    RPNHead,
    RPNSizes,
    add_gt_proposals,
    rpn_loss,
    rpn_postprocess,
    shared_ref_key_postprocess,
)
from .rcnn import RCNNConfig
from .rdn import VidConfig, _push


class MEGACarry(NamedTuple):
    """Streaming state. Local window buffers have the newest frame last.

    TPU redesign: instead of caching 25 raw C4 maps and re-running res5 + the
    key RPN at detect time (the reference's deques hold full feature maps),
    every per-frame quantity — ref proposals/features AND the frame's own
    key proposals/ROI-features — is computed once when the frame enters the
    window. The carry holds only small ROI tensors (~8 MB vs ~190 MB), and
    detect_key runs zero convolutions. Values are bit-identical to the
    recompute (deterministic network).

    LRM buffers (one per stage) and the global cache are rolled rings with
    per-slot validity (deques start empty in the reference)."""

    rois: jnp.ndarray  # (T, 75, 4) ref proposals
    roi_valid: jnp.ndarray  # (T, 75)
    feats: jnp.ndarray  # (T, 75, D) fc0 features (pre-global-enhancement)
    key_rois: jnp.ndarray  # (T, K, 4) key-version proposals per frame
    key_valid: jnp.ndarray  # (T, K)
    key_feats: jnp.ndarray  # (T, K, D) fc0 features of the key proposals
    sizes: jnp.ndarray  # (T, 2)
    mem_rois: tuple  # stage-i: (S, n_i, 4) with n_0=75, else advanced_num
    mem_feats: tuple  # stage-i: (S, n_i, D)
    mem_valid: tuple  # stage-i: (S, n_i)
    g_feats: jnp.ndarray  # (Gsize, 75, D)
    g_valid: jnp.ndarray  # (Gsize, 75)


class GeneralizedRCNNMEGA(nn.Module):
    c: RCNNConfig
    v: VidConfig

    def setup(self):
        dtype = jnp.dtype(self.c.compute_dtype)
        self.backbone = ResNetC4(
            depth=self.c.depth,
            freeze_at=self.c.freeze_at,
            stride_in_1x1=self.c.stride_in_1x1,
            norm=self.c.norm,
            dtype=dtype,
            name="backbone",
        )
        self.rpn = RPNHead(
            in_channels=1024,
            num_anchors=self.c.num_anchors_per_cell,
            dtype=dtype,
            name="rpn",
        )
        self.extractor = MEGAFeatureExtractor(
            depth=self.c.depth,
            reduce_channel=self.c.reduce_channel,
            resolution=self.c.pooler_resolution,
            spatial_scale=self.c.pooler_scale,
            sampling_ratio=self.c.pooler_sampling_ratio,
            mlp_dim=self.c.mlp_dim,
            dilation=self.c.res5_dilation,
            stride_in_1x1=self.c.stride_in_1x1,
            norm=self.c.norm,
            stage=self.v.base_stage,
            base_num=self.c.ref_post_nms_top_n,
            advanced_num=int(self.c.ref_post_nms_top_n * self.v.ratio),
            embed_dim=self.v.embed_dim,
            groups=self.v.groups,
            global_enable=self.v.global_enable,
            global_res_stage=self.v.global_res_stage,
            dtype=dtype,
            name="extractor",
        )
        self.predictor = FPNPredictor(
            num_classes=self.c.num_classes,
            cls_agnostic_bbox_reg=self.c.cls_agnostic_bbox_reg,
            dtype=dtype,
            name="predictor",
        )

    # -- shared helpers (mirrors rdn.py) ----------------------------------------
    def _anchors(self, feat_h: int, feat_w: int) -> jnp.ndarray:
        cell = generate_cell_anchors(
            self.c.anchor_stride, self.c.anchor_sizes, self.c.aspect_ratios
        )
        return grid_anchors(feat_h, feat_w, self.c.anchor_stride, cell)

    def _ref_sizes(self) -> RPNSizes:
        return RPNSizes(
            self.c.ref_pre_nms_top_n,
            self.c.ref_post_nms_top_n,
            self.c.rpn_nms_thresh,
            self.c.rpn_min_size,
        )

    def _key_sizes(self, train: bool) -> RPNSizes:
        return RPNSizes(
            self.c.pre_nms_top_n_train if train else self.c.pre_nms_top_n_test,
            self.c.post_nms_top_n_train if train else self.c.post_nms_top_n_test,
            self.c.rpn_nms_thresh,
            self.c.rpn_min_size,
        )

    def _ref_proposals(self, feats: jnp.ndarray, sizes: jnp.ndarray):
        objectness, deltas = self.rpn(feats)
        anchors = self._anchors(feats.shape[1], feats.shape[2])
        return rpn_postprocess(
            jax.lax.stop_gradient(objectness),
            jax.lax.stop_gradient(deltas),
            anchors,
            sizes,
            self._ref_sizes(),
        )

    # -- training ------------------------------------------------------------------
    def __call__(self, batch: dict, gt=None, rng=None, train: bool = False):
        assert train, "use test_step/precompute for streaming inference"
        return self.forward_train(batch, gt, rng)

    def forward_train(self, batch: dict, gt: dict, rng: jax.Array):
        """batch: {"local": ImageBatch (1+L frames, cur first),
                   "memory": ImageBatch (M frames),
                   "global": ImageBatch (G frames)}.
        gt is the current frame's padded ground truth (leading dim 1)."""
        c = self.c
        dtype = jnp.dtype(c.compute_dtype)
        imgs_l: ImageBatch = batch["local"]
        imgs_m: ImageBatch = batch["memory"]
        imgs_g: ImageBatch = batch["global"]

        feats_l = self.backbone(imgs_l.tensors.astype(dtype))
        feats_m = self.backbone(imgs_m.tensors.astype(dtype))
        feats_g = self.backbone(imgs_g.tensors.astype(dtype))

        cur_size = imgs_l.sizes[0:1]
        objectness, deltas = self.rpn(feats_l[0:1])
        anchors = self._anchors(feats_l.shape[1], feats_l.shape[2])
        rng_rpn, rng_roi = jax.random.split(rng)
        loss_obj, loss_rpn_box = rpn_loss(
            anchors, objectness, deltas, gt["boxes"], gt["valid"], cur_size, rng_rpn,
            batch_size_per_image=c.rpn_batch_size,
            positive_fraction=c.rpn_positive_fraction,
            fg_iou=c.rpn_fg_iou, bg_iou=c.rpn_bg_iou,
            straddle_thresh=c.straddle_thresh,
        )
        key_props = rpn_postprocess(
            jax.lax.stop_gradient(objectness),
            jax.lax.stop_gradient(deltas),
            anchors, cur_size, self._key_sizes(train=True),
        )
        key_props = add_gt_proposals(key_props, gt["boxes"], gt["valid"])
        rois = subsample_proposals(
            key_props.boxes, key_props.valid,
            gt["boxes"], gt["labels"], gt["valid"], rng_roi,
            bbox_reg_weights=c.bbox_reg_weights,
            batch_size_per_image=c.roi_batch_size,
            positive_fraction=c.roi_positive_fraction,
            fg_iou=c.roi_fg_iou, bg_iou=c.roi_bg_iou,
        )

        l_props = self._ref_proposals(feats_l, imgs_l.sizes)
        m_props = self._ref_proposals(feats_m, imgs_m.sizes)
        g_props = self._ref_proposals(feats_g, imgs_g.sizes)

        x = self.extractor.extract_train(
            feats_l,
            jax.lax.stop_gradient(feats_m),
            feats_g,
            rois.boxes[0],
            l_props.boxes, l_props.valid,
            m_props.boxes, m_props.valid,
            g_props.boxes, g_props.valid,
        )
        class_logits, box_reg = self.predictor(x)
        loss_cls, loss_box = fastrcnn_loss(
            class_logits[None], box_reg[None], rois, c.cls_agnostic_bbox_reg
        )
        return {
            "loss_objectness": loss_obj,
            "loss_rpn_box_reg": loss_rpn_box,
            "loss_classifier": loss_cls,
            "loss_box_reg": loss_box,
        }

    # -- streaming test --------------------------------------------------------
    def precompute(self, images: ImageBatch):
        """One frame → cache entry. Runs backbone + res5 + RPN head ONCE and
        derives both the ref (75) and key (300) proposal sets plus their
        pooled fc0 ROI features. The ref set is the rank-prefix of the key
        set under every shipped config (shared_ref_key_postprocess), so sort,
        NMS, pooling and fc0 all run once on the key set and ref slices."""
        feats = self.backbone(images.tensors.astype(jnp.dtype(self.c.compute_dtype)))
        objectness, deltas = self.rpn(feats)
        anchors = self._anchors(feats.shape[1], feats.shape[2])
        ref_props, key_props, prefix = shared_ref_key_postprocess(
            objectness, deltas, anchors, images.sizes,
            self._ref_sizes(), self._key_sizes(train=False),
        )
        enhanced = self.extractor.enhance_features(feats)
        key_feats = self.extractor.fc0(
            self.extractor.pool_flat(enhanced[0], key_props.boxes[0])
        )
        if prefix:
            ref_feats = key_feats[: self.c.ref_post_nms_top_n]
        else:
            ref_feats = self.extractor.fc0(
                self.extractor.pool_flat(enhanced[0], ref_props.boxes[0])
            )
        return {
            "rois": ref_props.boxes[0], "roi_valid": ref_props.valid[0],
            "feats": ref_feats,
            "key_rois": key_props.boxes[0], "key_valid": key_props.valid[0],
            "key_feats": key_feats,
        }

    def precompute_global(self, images: ImageBatch):
        """Global frames only need the 75-proposal fc0 features."""
        feats = self.backbone(images.tensors.astype(jnp.dtype(self.c.compute_dtype)))
        props = self._ref_proposals(feats, images.sizes)
        pooled = self.extractor.precompute_ref(feats[0], props.boxes[0])
        return pooled, props.valid[0]

    def precompute_pair(self, images: ImageBatch, global_images=None):
        """One local + one global frame through ONE backbone/RPN/res5 pass.

        Identical per-frame math to precompute + precompute_global (batch-2
        convolutions are per-sample independent); batching the two passes
        keeps the conv pipeline fed (the steady-state MEGA protocol runs
        both every frame). Returns (entry, g_pooled, g_valid).

        Preferred form: ``global_images=None`` with ``images`` already the
        stacked batch-2 pair (row 0 = local frame, row 1 = global frame) —
        the engines stack the uint8 frames before normalization, so no
        device-side concatenate of the two normalized canvases exists (the
        post-normalize concat cost a 0.11 ms/frame relayout copy in the
        profiled streaming step)."""
        dt = jnp.dtype(self.c.compute_dtype)
        if global_images is None:
            both = images.tensors.astype(dt)
            cur_sizes, g_sizes = images.sizes[:1], images.sizes[1:]
        else:
            both = jnp.concatenate(
                [images.tensors, global_images.tensors], 0
            ).astype(dt)
            cur_sizes, g_sizes = images.sizes, global_images.sizes
        feats = self.backbone(both)  # (2, H', W', 1024)
        objectness, deltas = self.rpn(feats)
        anchors = self._anchors(feats.shape[1], feats.shape[2])
        enhanced = self.extractor.enhance_features(feats)

        ref_props, key_props, prefix = shared_ref_key_postprocess(
            objectness[:1], deltas[:1], anchors, cur_sizes,
            self._ref_sizes(), self._key_sizes(train=False),
        )
        key_feats = self.extractor.fc0(
            self.extractor.pool_flat(enhanced[0], key_props.boxes[0])
        )
        ref_feats = (
            key_feats[: self.c.ref_post_nms_top_n]
            if prefix
            else self.extractor.fc0(
                self.extractor.pool_flat(enhanced[0], ref_props.boxes[0])
            )
        )
        entry = {
            "rois": ref_props.boxes[0], "roi_valid": ref_props.valid[0],
            "feats": ref_feats,
            "key_rois": key_props.boxes[0], "key_valid": key_props.valid[0],
            "key_feats": key_feats,
        }
        g_props = rpn_postprocess(
            jax.lax.stop_gradient(objectness[1:]),
            jax.lax.stop_gradient(deltas[1:]),
            anchors, g_sizes, self._ref_sizes(),
        )
        g_pooled = self.extractor.fc0(
            self.extractor.pool_flat(enhanced[1], g_props.boxes[0])
        )
        return entry, g_pooled, g_props.valid[0]

    def apply_global(self, carry: "MEGACarry", pooled, valid) -> "MEGACarry":
        """Push precomputed global-frame features into the global cache."""
        return carry._replace(
            g_feats=_push(carry.g_feats, pooled),
            g_valid=_push(carry.g_valid, valid),
        )

    def init_carry(self, entry, size) -> MEGACarry:
        t = self.v.all_frame_interval
        s = self.v.memory_size
        g = self.v.global_size
        bn = self.c.ref_post_nms_top_n
        an = int(bn * self.v.ratio)
        d = self.c.mlp_dim
        tile = lambda a: jnp.tile(a[None], (t,) + (1,) * a.ndim)  # noqa: E731
        mem_n = [bn] + [an] * (self.v.base_stage - 1)
        return MEGACarry(
            rois=tile(entry["rois"]),
            roi_valid=tile(entry["roi_valid"]),
            feats=tile(entry["feats"]),
            key_rois=tile(entry["key_rois"]),
            key_valid=tile(entry["key_valid"]),
            key_feats=tile(entry["key_feats"]),
            sizes=tile(size),
            mem_rois=tuple(jnp.zeros((s, n, 4), jnp.float32) for n in mem_n),
            mem_feats=tuple(jnp.zeros((s, n, d), jnp.float32) for n in mem_n),
            mem_valid=tuple(jnp.zeros((s, n), bool) for n in mem_n),
            g_feats=jnp.zeros((g, bn, d), jnp.float32),
            g_valid=jnp.zeros((g, bn), bool),
        )

    def push_carry(self, carry: MEGACarry, entry, size) -> MEGACarry:
        return carry._replace(
            rois=_push(carry.rois, entry["rois"]),
            roi_valid=_push(carry.roi_valid, entry["roi_valid"]),
            feats=_push(carry.feats, entry["feats"]),
            key_rois=_push(carry.key_rois, entry["key_rois"]),
            key_valid=_push(carry.key_valid, entry["key_valid"]),
            key_feats=_push(carry.key_feats, entry["key_feats"]),
            sizes=_push(carry.sizes, size),
        )

    def update_global(self, carry: MEGACarry, images: ImageBatch) -> MEGACarry:
        """Feed one global frame (generalized_rcnn_mega.py:201-208)."""
        pooled, valid = self.precompute_global(images)
        return carry._replace(
            g_feats=_push(carry.g_feats, pooled),
            g_valid=_push(carry.g_valid, valid),
        )

    def detect_key(self, carry: MEGACarry):
        """Detect on the key slot; returns (new_carry, Detections).

        Convolution-free: the key frame's proposals and pooled ROI features
        were computed at entry; only the attention stack + heads run here."""
        c, v = self.c, self.v
        k = v.key_frame_location
        key_size = carry.sizes[k][None]
        key_rois = carry.key_rois[k]
        key_valid = carry.key_valid[k]
        x_key = carry.key_feats[k]

        t = v.all_frame_interval
        window = RefSet(
            rois=carry.rois.reshape(t * c.ref_post_nms_top_n, 4),
            feats=carry.feats.reshape(t * c.ref_post_nms_top_n, -1),
            valid=carry.roi_valid.reshape(t * c.ref_post_nms_top_n),
        )
        lrm = tuple(
            RefSet(
                rois=carry.mem_rois[i].reshape(-1, 4),
                feats=carry.mem_feats[i].reshape(-1, carry.mem_feats[i].shape[-1]),
                valid=carry.mem_valid[i].reshape(-1),
            )
            for i in range(v.base_stage)
        )
        x, pushes = self.extractor.extract_test(
            x_key,
            key_rois,
            window,
            lrm,
            carry.g_feats.reshape(-1, carry.g_feats.shape[-1]),
            carry.g_valid.reshape(-1),
        )

        carry = carry._replace(
            mem_rois=tuple(
                _push(carry.mem_rois[i], pushes[i].rois) for i in range(v.base_stage)
            ),
            mem_feats=tuple(
                _push(carry.mem_feats[i], pushes[i].feats) for i in range(v.base_stage)
            ),
            mem_valid=tuple(
                _push(carry.mem_valid[i], pushes[i].valid) for i in range(v.base_stage)
            ),
        )

        class_logits, box_reg = self.predictor(x)
        dets = postprocess_detections(
            class_logits[None], box_reg[None], key_rois[None], key_valid[None], key_size,
            bbox_reg_weights=c.bbox_reg_weights,
            score_thresh=c.score_thresh,
            nms_thresh=c.nms_thresh,
            detections_per_img=c.detections_per_img,
        )
        return carry, dets

    def test_step(self, carry: MEGACarry, images: ImageBatch, global_images=None):
        """Steady state: push one local frame (+ optionally one global frame),
        then detect at the key slot.

        A batch-2 ``images`` with ``global_images=None`` is the stacked pair
        form (row 0 = local, row 1 = global; see precompute_pair) — engines
        run batch 1 per lane, so the shape is unambiguous."""
        if global_images is None and images.tensors.shape[0] == 2:
            entry, g_pooled, g_valid = self.precompute_pair(images)
            carry = self.push_carry(carry, entry, images.sizes[0])
            carry = self.apply_global(carry, g_pooled, g_valid)
            return self.detect_key(carry)
        if (
            global_images is not None
            and global_images.tensors.shape == images.tensors.shape
        ):
            entry, g_pooled, g_valid = self.precompute_pair(images, global_images)
            carry = self.push_carry(carry, entry, images.sizes[0])
            carry = self.apply_global(carry, g_pooled, g_valid)
            return self.detect_key(carry)
        entry = self.precompute(images)
        carry = self.push_carry(carry, entry, images.sizes[0])
        if global_images is not None:
            carry = self.update_global(carry, global_images)
        return self.detect_key(carry)


def build_mega_flagship(canvas_h: int, canvas_w: int, batch: int = 1):
    """bench.py hook: steady-state MEGA R-101 streaming on the eval canvas.

    ``batch`` > 1 vmaps the whole per-frame step over that many independent
    video lanes — the offline-eval configuration, where lockstep lanes fill
    the chip that a single batch-1 stream leaves idle."""
    import numpy as np

    c = RCNNConfig(depth="R-101", compute_dtype="bfloat16")
    v = VidConfig(
        method="mega",
        base_stage=3,
        all_frame_interval=25,
        key_frame_location=12,
    )
    model = GeneralizedRCNNMEGA(c=c, v=v)
    rs = np.random.RandomState(0)
    # frames arrive s2d(4)-packed (H/4, W/4, 48), matching the lockstep
    # engine's host-packed feed → the stem runs its 3x3x48 reformulation
    # with the fused packed maxpool (resnet.s2d4_stem_kernel)
    ph, pw = canvas_h // 4, canvas_w // 4
    one = ImageBatch(
        tensors=jnp.asarray(rs.randn(1, ph, pw, 48) * 50, jnp.float32),
        sizes=jnp.array([[600.0, 1000.0]], jnp.float32),
    )
    # two-phase init: precompute params suffice to build a carry, then a full
    # test_step init creates every parameter the streaming path touches.
    # Each phase is jitted: un-jitted flax init/apply dispatches op-by-op,
    # which costs minutes through a ~30ms-RTT device relay.
    def _boot(key, one):
        tmp = model.init(key, one, method=GeneralizedRCNNMEGA.precompute)["params"]
        entry = model.apply({"params": tmp}, one, method=GeneralizedRCNNMEGA.precompute)
        return model.apply(
            {"params": tmp}, entry, one.sizes[0], method=GeneralizedRCNNMEGA.init_carry
        )

    carry = jax.jit(_boot)(jax.random.PRNGKey(0), one)
    params = jax.jit(
        lambda key, carry, one: model.init(
            key, carry, one, method=GeneralizedRCNNMEGA.test_step
        )
    )(jax.random.PRNGKey(0), carry, one)["params"]

    def step_one(params, carry, pair):
        # the full product step (vid_mega.py test protocol): push one local
        # frame AND apply one global-cache update (a second backbone pass)
        # every frame — matching StreamingInferencer / the lockstep engine,
        # which feeds the stacked batch-2 pair (row 0 local, row 1 global)
        new_carry, dets = model.apply(
            {"params": params}, carry, pair,
            method=GeneralizedRCNNMEGA.test_step,
        )
        return new_carry, dets.scores.sum()

    pair = ImageBatch(
        tensors=jnp.asarray(rs.randn(2, ph, pw, 48) * 50, jnp.float32),
        sizes=jnp.tile(one.sizes, (2, 1)),
    )

    if batch == 1:
        def fn(params, state):
            # frames ride the state (not the closure) so a chained-scan
            # benchmark can perturb them per iteration — otherwise XLA
            # hoists the loop-invariant backbone passes out of the loop
            carry, images = state
            return step_one(params, carry, images["pair"])

        return fn, params, (carry, {"pair": pair}), "MEGA R-101 streaming"

    carries = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), carry
    )
    pairs = ImageBatch(
        tensors=jnp.asarray(rs.randn(batch, 2, ph, pw, 48) * 50, jnp.float32),
        sizes=jnp.tile(one.sizes[None], (batch, 2, 1)),
    )

    def fn(params, state):
        carries, images = state
        new_carries, scores = jax.vmap(
            lambda cr, im: step_one(params, cr, im)
        )(carries, images["pair"])
        return new_carries, scores.sum()

    return fn, params, (
        carries, {"pair": pairs},
    ), f"MEGA R-101 streaming x{batch} videos"
