"""Detector-zoo components outside the VID path: FPN, RetinaNet, mask and
keypoint heads, segmentation structures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mega_pytorch_tpu.utils.misc import jit_init

from mega_pytorch_tpu.models.backbone.fpn import FPN, ResNetFPNBody
from mega_pytorch_tpu.models.roi_heads.mask_head import (
    KeypointRCNNFeatureExtractor,
    KeypointRCNNPredictor,
    MaskRCNNC4Predictor,
    MaskRCNNFPNFeatureExtractor,
    keypointrcnn_inference,
    keypointrcnn_loss,
    maskrcnn_inference,
    maskrcnn_loss,
)
from mega_pytorch_tpu.models.rpn.retinanet import (
    RetinaNetHead,
    retinanet_anchors,
    retinanet_inference,
    retinanet_loss,
)
from mega_pytorch_tpu.structures.segmentation import (
    FLIP_LEFT_RIGHT,
    Keypoints,
    PolygonInstance,
    SegmentationMask,
)


def test_fpn_pyramid_shapes():
    body = ResNetFPNBody(depth="R-50")
    x = jnp.zeros((1, 128, 160, 3))
    params = jit_init(body, jax.random.PRNGKey(0), x)["params"]
    feats = body.apply({"params": params}, x)
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]
    assert feats[0].shape[1:3] == (32, 40)  # stride 4
    assert feats[3].shape[1:3] == (4, 5)  # stride 32

    fpn = FPN(out_channels=256, top_block="maxpool")
    fp = jit_init(fpn, jax.random.PRNGKey(1), feats)["params"]
    levels = fpn.apply({"params": fp}, feats)
    assert len(levels) == 5  # P2..P6
    assert all(l.shape[-1] == 256 for l in levels)
    assert levels[0].shape[1:3] == (32, 40)
    assert levels[4].shape[1:3] == (2, 3)  # P6 = stride-2 maxpool of P5

    fpn7 = FPN(out_channels=256, top_block="p6p7")
    fp7 = jit_init(fpn7, jax.random.PRNGKey(2), feats[1:])["params"]
    levels7 = fpn7.apply({"params": fp7}, feats[1:])
    assert len(levels7) == 5  # P3..P7


def test_retinanet_head_loss_inference():
    shapes = [(8, 10), (4, 5)]
    feats = [jnp.zeros((1, h, w, 256)) for h, w in shapes]
    head = RetinaNetHead(num_classes=5, num_anchors=9, num_convs=2)
    params = jit_init(head, jax.random.PRNGKey(0), feats)["params"]
    logits, bbox = head.apply({"params": params}, feats)
    assert logits[0].shape == (1, 8 * 10 * 9, 5)
    assert bbox[1].shape == (1, 4 * 5 * 9, 4)

    anchors = retinanet_anchors(shapes, sizes=(32, 64), strides=(8, 16))
    assert anchors[0].shape == (8 * 10 * 9, 4)

    all_anchors = jnp.concatenate(anchors, axis=0)
    all_logits = jnp.concatenate([l[0] for l in logits], axis=0)
    all_bbox = jnp.concatenate([b[0] for b in bbox], axis=0)
    gt = jnp.array([[5.0, 5.0, 40.0, 40.0]])
    cls_loss, reg_loss = retinanet_loss(
        all_anchors, all_logits, all_bbox, gt, jnp.array([2]), jnp.array([True])
    )
    assert np.isfinite(float(cls_loss)) and np.isfinite(float(reg_loss))
    # prior-prob bias init keeps the focal loss small at start
    assert float(cls_loss) < 5.0

    boxes, scores, labels, valid = retinanet_inference(
        anchors, [l[0] for l in logits], [b[0] for b in bbox],
        (64.0, 80.0), pre_nms_top_n=50, detections_per_img=10,
    )
    assert boxes.shape == (10, 4)
    assert np.isfinite(np.asarray(scores)).all()


def test_mask_head_roundtrip():
    ext = MaskRCNNFPNFeatureExtractor(resolution=14)
    feat = jnp.zeros((1, 16, 20, 64))
    rois = jnp.array([[[16.0, 16.0, 128.0, 128.0], [0.0, 0.0, 64.0, 64.0]]])
    p = jit_init(ext, jax.random.PRNGKey(0), feat, rois)["params"]
    x = ext.apply({"params": p}, feat, rois)
    assert x.shape == (1, 2, 14, 14, 256)

    pred = MaskRCNNC4Predictor(num_classes=5)
    pp = jit_init(pred, jax.random.PRNGKey(1), x)["params"]
    logits = pred.apply({"params": pp}, x)
    assert logits.shape == (1, 2, 28, 28, 5)

    labels = jnp.array([[1, 3]])
    valid = jnp.array([[True, True]])
    targets = jnp.zeros((1, 2, 28, 28)).at[:, :, 5:15, 5:15].set(1.0)
    loss = maskrcnn_loss(logits, targets, labels, valid)
    assert np.isfinite(float(loss)) and float(loss) > 0

    probs = maskrcnn_inference(logits, labels)
    assert probs.shape == (1, 2, 28, 28)
    assert float(probs.min()) >= 0 and float(probs.max()) <= 1


def test_keypoint_head_roundtrip():
    ext = KeypointRCNNFeatureExtractor(layers=(64, 64))
    feat = jnp.zeros((1, 16, 20, 32))
    rois = jnp.array([[[0.0, 0.0, 64.0, 64.0]]])
    p = jit_init(ext, jax.random.PRNGKey(0), feat, rois)["params"]
    x = ext.apply({"params": p}, feat, rois)
    pred = KeypointRCNNPredictor(num_keypoints=17)
    pp = jit_init(pred, jax.random.PRNGKey(1), x)["params"]
    heat = pred.apply({"params": pp}, x)
    assert heat.shape == (1, 1, 56, 56, 17)

    targets = jnp.zeros((1, 1, 17), jnp.int32) + 5 * 56 + 9
    vis = jnp.ones((1, 1, 17), bool)
    loss = keypointrcnn_loss(heat, targets, vis)
    assert np.isfinite(float(loss))

    xy, scores = keypointrcnn_inference(heat, rois)
    assert xy.shape == (1, 1, 17, 2)
    bx = np.asarray(xy)
    assert (bx[..., 0] >= 0).all() and (bx[..., 0] <= 64).all()


def test_segmentation_polygon_ops():
    # a 10x10 square at (5, 5)
    poly = PolygonInstance([[5, 5, 15, 5, 15, 15, 5, 15]], (40, 30))
    m = poly.rasterize()
    assert m.shape == (30, 40)
    assert m[10, 10] == 1 and m[0, 0] == 0

    flipped = poly.transpose(FLIP_LEFT_RIGHT)
    mf = flipped.rasterize()
    assert mf[10, 40 - 11] == 1

    resized = poly.resize((80, 60))
    mr = resized.rasterize()
    assert mr.shape == (60, 80) and mr[20, 20] == 1

    seg = SegmentationMask([[[5, 5, 15, 5, 15, 15, 5, 15]]], (40, 30))
    targets = seg.to_mask_targets(np.array([[5.0, 5.0, 15.0, 15.0]]), mask_size=28)
    assert targets.shape == (1, 28, 28)
    assert targets.mean() > 0.5  # box-tight instance fills most of the target


def test_keypoints_ops():
    kp = Keypoints(np.array([[[10.0, 20.0, 2.0]]]), (40, 30))
    r = kp.resize((80, 60))
    np.testing.assert_allclose(r.keypoints[0, 0, :2], [20.0, 40.0])
    f = kp.transpose(FLIP_LEFT_RIGHT)
    np.testing.assert_allclose(f.keypoints[0, 0, 0], 40 - 10 - 1)


@pytest.mark.slow
def test_fbnet_trunk_and_heads():
    from mega_pytorch_tpu.models.backbone.fbnet import (
        FBNetTrunk,
        MODEL_ARCH,
        add_archs,
        build_fbnet_backbone,
        build_fbnet_head,
    )
    from mega_pytorch_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    trunk = build_fbnet_backbone(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    p = jit_init(trunk, jax.random.PRNGKey(0), x)["params"]
    out = trunk.apply({"params": p}, x)
    # default arch: first conv /2, then stage strides 1,2,2,2 → /16, 96 ch
    assert out.shape == (1, 4, 4, 96)
    assert trunk.out_channels == 96

    head = build_fbnet_head(cfg, "bbox", in_channels=96)
    hp = jit_init(head, jax.random.PRNGKey(1), out)["params"]
    ho = head.apply({"params": hp}, out)
    assert ho.shape == (1, 2, 2, 240)  # bbox stage strides 2,1,1 → /2, 240 ch

    # custom arch registration
    add_archs({"tiny_test": {
        "first": [8, 2],
        "stages": [[[1, 8, 1, 1]], [[2, 16, 1, 2]]],
        "backbone": [0, 1], "rpn": [], "bbox": [], "mask": [],
        "kernel": 3,
    }})
    t2 = FBNetTrunk(arch="tiny_test")
    p2 = jit_init(t2, jax.random.PRNGKey(2), x)["params"]
    o2 = t2.apply({"params": p2}, x)
    assert o2.shape == (1, 16, 16, 16)


def test_comm_single_host():
    from mega_pytorch_tpu.utils.comm import (
        all_gather,
        get_rank,
        get_world_size,
        is_main_process,
        reduce_dict,
        synchronize,
    )

    assert get_world_size() == 1 and get_rank() == 0 and is_main_process()
    synchronize()
    assert all_gather({"a": 1}) == [{"a": 1}]
    assert reduce_dict({"x": 2.0}) == {"x": 2.0}


def test_registry():
    from mega_pytorch_tpu.utils.registry import Registry

    r = Registry()

    @r.register("foo")
    def foo():
        return 42

    assert r["foo"]() == 42
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        r.register("foo", foo)


def test_flownet_ckpt_ingestion(tmp_path):
    import torch

    from mega_pytorch_tpu.models.backbone.flownet import FlowNetS
    from mega_pytorch_tpu.utils.model_ingest import load_flownet_weights

    net = FlowNetS(method="fgfa")
    x = jnp.zeros((1, 64, 96, 6))
    init = {"flownet": jit_init(net, jax.random.PRNGKey(0), x)["params"]}

    sd = {
        "flow_conv1.weight": torch.randn(64, 6, 7, 7),
        "flow_conv1.bias": torch.randn(64),
        "deconv5.weight": torch.randn(1024, 512, 4, 4),
        "deconv5.bias": torch.randn(512),
    }
    f = tmp_path / "flownet.ckpt"
    torch.save({"state_dict": sd}, f)
    merged = load_flownet_weights(str(f), init)
    np.testing.assert_allclose(
        merged["flownet"]["flow_conv1"]["kernel"],
        sd["flow_conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        merged["flownet"]["deconv5"]["kernel"],
        sd["deconv5.weight"].numpy().transpose(2, 3, 1, 0),
    )


def test_combined_roi_heads_mask_branch():
    from mega_pytorch_tpu.models.roi_heads.combined import (
        CombinedROIHeads,
        mask_targets_from_dense,
    )
    from mega_pytorch_tpu.models.roi_heads.subsample import SampledRois

    # dense GT mask: instance covering a known square
    gt_masks = jnp.zeros((1, 2, 64, 96)).at[0, 0, 10:30, 20:50].set(1.0)
    rois = SampledRois(
        boxes=jnp.array([[[20.0, 10.0, 49.0, 29.0], [0.0, 32.0, 20.0, 60.0]]]),
        valid=jnp.array([[True, True]]),
        labels=jnp.array([[3, 0]]),
        reg_targets=jnp.zeros((1, 2, 4)),
    )
    matched = jnp.array([[0, 1]])

    # target for roi 0 (exactly the instance box) is nearly all ones
    t = mask_targets_from_dense(gt_masks[0], matched[0], rois.boxes[0], 28)
    assert t.shape == (2, 28, 28)
    assert float(t[0].mean()) > 0.9
    assert float(t[1].mean()) < 0.1  # background region

    heads = CombinedROIHeads(mask_on=True, num_classes=5, spatial_scale=1 / 16.0)
    feat = jnp.asarray(np.random.RandomState(0).randn(1, 4, 6, 32), jnp.float32)
    params = jit_init(heads,
        jax.random.PRNGKey(0), feat, rois, gt_masks, matched,
        method=heads.mask_losses,
    )["params"]
    losses = heads.apply(
        {"params": params}, feat, rois, gt_masks, matched, method=heads.mask_losses
    )
    assert np.isfinite(float(losses["loss_mask"])) and float(losses["loss_mask"]) > 0

    probs = heads.apply(
        {"params": params}, feat, rois.boxes, rois.labels, method=heads.mask_probs
    )
    assert probs.shape == (1, 2, 28, 28)


def test_fbnet_arch_zoo_builds():
    """Every reference arch (fbnet_modeldef.py:12-218) builds and produces
    the expected trunk output channels, incl. cham's per-block kernels."""
    import jax

    from mega_pytorch_tpu.models.backbone.fbnet import MODEL_ARCH, FBNetTrunk

    expected_out = {
        "default": 96, "xirb16d_dsmask": 128, "mobilenet_v2": 96,
        "cham_v1a": 88, "cham_v2": 56,
    }
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    for arch, out_c in expected_out.items():
        assert arch in MODEL_ARCH
        trunk = FBNetTrunk(arch=arch)
        assert trunk.out_channels == out_c, arch
        shape = jax.eval_shape(
            lambda m=trunk: m.init_with_output(jax.random.PRNGKey(0), x)[0]
        )
        # stride 16 trunk: 64/16 = 4
        assert shape.shape == (1, 4, 4, out_c), (arch, shape.shape)


def test_fbnet_rpn_head_groups():
    import jax

    from mega_pytorch_tpu.models.backbone.fbnet import FBNetTrunk

    for arch, in_c, out_c in [
        ("default", 96, 96), ("cham_v1a", 88, 88), ("xirb16d_dsmask", 128, 128)
    ]:
        head = FBNetTrunk(arch=arch, stage_group="rpn", in_channels=in_c)
        assert head.out_channels == out_c
        x = jnp.zeros((1, 8, 8, in_c), jnp.float32)
        shape = jax.eval_shape(
            lambda m=head: m.init_with_output(jax.random.PRNGKey(0), x)[0]
        )
        assert shape.shape == (1, 8, 8, out_c), arch


def test_fbnet_mask_stage_upsample():
    """Negative-stride mask stages decode as 2x upsample blocks
    (fbnet_builder.py upsample semantics; advisor r2 regression)."""
    import jax

    from mega_pytorch_tpu.models.backbone.fbnet import MODEL_ARCH, FBNetTrunk

    for arch, out_c in [("default", 80), ("xirb16d_dsmask", 64)]:
        spec = MODEL_ARCH[arch]
        assert any(
            s < 0 for i in spec["mask"] for (_, _, _, s) in spec["stages"][i]
        ), arch
        trunk = FBNetTrunk(arch=arch)
        m = FBNetTrunk(arch=arch, stage_group="mask", in_channels=trunk.out_channels)
        x = jnp.zeros((1, 8, 8, trunk.out_channels), jnp.float32)
        shape = jax.eval_shape(
            lambda mm=m, xx=x: mm.init_with_output(jax.random.PRNGKey(0), xx)[0]
        )
        assert shape.shape[1] > 8, (arch, shape.shape)  # net upsample happened
        assert shape.shape[-1] == out_c, (arch, shape.shape)
