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
from mega_pytorch_tpu.utils.misc import jit_init

import jax
import jax.numpy as jnp
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


def test_soft_roi_align_matches_kernel():
    """The pure-torch recompute that synthesizes the missing CPU backward
    must reproduce the _C forward exactly (guards the gradient oracle)."""
    from reference_harness import install_differentiable_roi_align

    soft_fn = install_differentiable_roi_align()
    import sys as _sys

    _C = _sys.modules["mega_core._C"]
    rng = np.random.RandomState(0)
    feat = torch.from_numpy(rng.randn(2, 8, 24, 32).astype(np.float32))
    rois = torch.tensor(
        [
            [0, 0.0, 0.0, 100.0, 100.0],
            [1, 16.0, 16.0, 400.0, 300.0],
            [0, -10.0, -10.0, 40.0, 500.0],
            [1, 30.0, 30.0, 30.5, 30.5],
        ],
        dtype=torch.float32,
    )
    for sr in (0, 2):
        exact = _C.roi_align_forward(feat, rois, 1 / 16.0, 7, 7, sr)
        soft = soft_fn(feat, rois, (7, 7), 1 / 16.0, sr)
        np.testing.assert_allclose(
            soft.detach().numpy(), exact.numpy(), rtol=1e-5, atol=1e-5
        )


def _ref_train_cfg(**overrides):
    load_reference()
    from reference_harness import install_differentiable_roi_align

    install_differentiable_roi_align()
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


def _ingest_train(ref_model, our_model, example_args):
    """Like test_parity_reference._ingest but inits the TRAIN graph."""
    from mega_pytorch_tpu.utils.model_ingest import (
        convert_reference_state_dict,
        merge_params,
    )

    init = jit_init(our_model, jax.random.PRNGKey(0), *example_args, train=True)[
        "params"
    ]
    missing = []

    class Collect:
        def info(self, msg):
            if "no checkpoint value" in msg:
                missing.append(msg)

    merged = merge_params(
        init, convert_reference_state_dict(dict(ref_model.state_dict())),
        Collect(),
    )
    assert not missing, missing
    return merged


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


def _grad_compare(ref_model, our_grads, min_checked=20, cond_tree=None,
                  cond_factor=5.0, base_tol=2e-3):
    """Convert torch .grad tensors with the weight converter; compare to ours.

    cond_tree: optional per-leaf gradient CONDITIONING measurement — how far
    our own gradient moves under a 1e-6 relative param jitter (same flatten
    layout as our_grads). When given, each leaf's tolerance is
    max(base_tol, cond_factor * movement): through stacked attention-softmax
    backward passes the gradient is chaotic in fp32 (measured: a 1e-6 jitter
    moves l_attn_0 leaves by up to 30% at MEGA train-parity shapes while the
    losses move <3e-6), so no two fp32 implementations can agree tighter than
    the conditioning floor. Leaves outside the chaotic subtree keep base_tol.
    """
    from mega_pytorch_tpu.utils.model_ingest import convert_reference_state_dict

    torch_grads = {
        n: p.grad for n, p in ref_model.named_parameters() if p.grad is not None
    }
    assert torch_grads, "reference backward produced no grads"
    ref_tree = dict(_flatten(convert_reference_state_dict(torch_grads)))
    our_tree = dict(_flatten(our_grads))
    cond = dict(_flatten(cond_tree)) if cond_tree is not None else {}

    checked, skipped = 0, []
    errs = []
    for name, r in ref_tree.items():
        if name not in our_tree:
            skipped.append(name)
            continue
        o = our_tree[name]
        assert o.shape == r.shape, name
        scale = max(np.abs(r).max(), 1e-6)
        err = np.abs(o - r).max() / scale
        tol = base_tol
        if name in cond:
            movement = float(np.abs(cond[name]).max()) / scale
            tol = max(tol, cond_factor * movement)
        assert err < tol, (name, err, tol, float(np.abs(r).max()))
        errs.append(err)
        checked += 1
    assert checked >= min_checked, (checked, skipped)
    if cond:
        # systematic bugs shift the whole tree, chaos doesn't: the bulk of
        # leaves must still agree tightly even when hot leaves use cond-tol
        assert float(np.median(errs)) < 2e-2, float(np.median(errs))

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
    params = _ingest_train(ref_model, model, (images, gt, rng))

    def losses_fn(p):
        d = model.apply({"params": p}, images, gt, rng, train=True)
        return sum(d.values()), d

    (_, our_losses), our_grads = jax.jit(
        lambda p: jax.value_and_grad(losses_fn, has_aux=True)(p)
    )(params)

    _loss_compare(ref_losses, our_losses)
    _grad_compare(ref_model, our_grads)


def _cond_movement(gradf, params, our_grads):
    """Per-leaf gradient CONDITIONING floor: rerun the SAME compiled grad with
    a 1e-6 relative rademacher jitter; the movement measures how chaotic each
    leaf's backward is (stacked attention-softmax stages amplify fp32
    rounding — probe at MEGA shapes: l_attn_0 moves ~30%, median leaf 6e-3,
    losses <3e-6). Feed the result to _grad_compare(cond_tree=...)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    jittered = jax.tree_util.tree_unflatten(
        treedef,
        [
            leaf
            * (1.0 + 1e-6 * jax.random.rademacher(k, leaf.shape, jnp.float32))
            for leaf, k in zip(leaves, keys)
        ],
    )
    _, jit_grads = gradf(jittered)
    return jax.tree_util.tree_map(
        lambda a, b: np.asarray(a) - np.asarray(b), our_grads, jit_grads
    )


# -- MEGA train parity ---------------------------------------------------------

T_L, T_M, T_G = 2, 3, 2  # local refs, memory frames, global frames
REF_POST_TRAIN = 12
STAGES_TRAIN = 2


def test_mega_train_parity(tmp_path):
    """MEGA train step (local + memory + global pools, relation attention,
    LRM build under no_grad): losses AND gradients match — in particular the
    stop_gradient placement on the memory pool and the ref-RPN
    (generalized_rcnn_mega.py:80-135, rpn.py:240-243).

    Fast-lane resident (VERDICT r3 next #6): ~1.5 min warm-cache; the default
    run must fail if the flagship's training numerics drift.

    Gradient tolerances are conditioning-bounded (see _grad_compare): after
    fixing the one real semantic bug this harness caught (bf16 sinusoids in
    the position-bias contraction corrupted dWg ~3x while losses matched to
    1e-7 — attention.py precise_bias), the residual vs torch (max ~0.2 on
    l_attn_0/Wg, median 1.3e-2) sits INSIDE the backward's own fp32 chaos
    (1e-6 param jitter moves the same leaves up to 30%, median 6e-3), so the
    per-leaf bound is max(2e-3, 5x measured movement) plus a median<2e-2
    whole-tree guard that chaos cannot mask a systematic shift."""
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
    from test_parity_reference import _temper

    # untempered random RPN deltas make degenerate (negative-extent) boxes
    # whose relation-position features are NaN in BOTH stacks (see the
    # streaming parity note); both ingest the same tempered weights
    ref_model = _temper(build_detection_model(cfg))
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
    params = _ingest_train(ref_model, model, (batch, gt, rng))

    def losses_fn(p):
        d = model.apply({"params": p}, batch, gt, rng, train=True)
        return sum(d.values()), d

    gradf = jax.jit(lambda p: jax.value_and_grad(losses_fn, has_aux=True)(p))
    (_, our_losses), our_grads = gradf(params)

    # per-leaf conditioning floor: rerun the SAME compiled grad with a 1e-6
    # relative rademacher jitter; the movement measures how chaotic each
    # leaf's backward is (3 stacked softmax stages amplify fp32 rounding —
    # probe: l_attn_0 moves ~30%, median leaf 6e-3, losses <3e-6)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    jittered = jax.tree_util.tree_unflatten(
        treedef,
        [
            leaf
            * (1.0 + 1e-6 * jax.random.rademacher(k, leaf.shape, jnp.float32))
            for leaf, k in zip(leaves, keys)
        ],
    )
    _, jit_grads = gradf(jittered)
    movement = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a) - np.asarray(b), our_grads, jit_grads
    )

    _loss_compare(ref_losses, our_losses, atol=5e-4)
    _grad_compare(ref_model, our_grads, cond_tree=movement)


# -- DFF / FGFA / RDN train parity (VERDICT r3 next #4) -------------------------


def _il_frames(frames, f):
    from mega_core.structures.image_list import to_image_list

    t = torch.from_numpy(
        np.ascontiguousarray(_norm_rgb(frames[f]).transpose(2, 0, 1))
    )
    return to_image_list([t])


def _our_frames(frames, ids):
    from mega_pytorch_tpu.structures.image_list import ImageBatch

    return ImageBatch(
        tensors=np.stack([_norm_rgb(frames[f]) for f in ids]),
        sizes=np.tile(
            np.array([[float(H_M), float(W_M)]], np.float32), (len(ids), 1)
        ),
    )


def _run_train_parity(ref_factory, model, make_ref_images, our_images,
                      loss_atol=2e-4, use_cond=False, f64_oracle=False,
                      f64_tol=1e-4):
    """Shared tail: backward on the reference, value_and_grad on ours,
    losses + gradients compared.

    f64_oracle: gradients are checked against the reference's FLOAT64
    autograd instead of its f32 one — strictly tighter where torch's own f32
    backward is ill-conditioned (measured DFF: torch f32 deviates from its
    f64 truth by up to 2.2% on layer2 leaves — the exact leaves and
    magnitudes of the apparent cross-stack mismatch — while our f32 grads
    sit within 4e-6 of the f64 truth on every leaf). use_cond keeps the
    f32 conditioning floor for methods whose f64 pass is impractical."""
    ref_model = ref_factory()
    ref_losses = ref_model(make_ref_images(), [_ref_target(H_M, W_M)])
    sum(ref_losses.values()).backward()

    gt = _our_gt()
    rng = jax.random.PRNGKey(0)
    params = _ingest_train(ref_model, model, (our_images, gt, rng))

    def losses_fn(p):
        d = model.apply({"params": p}, our_images, gt, rng, train=True)
        return sum(d.values()), d

    gradf = jax.jit(lambda p: jax.value_and_grad(losses_fn, has_aux=True)(p))
    (_, our_losses), our_grads = gradf(params)

    _loss_compare(ref_losses, our_losses, atol=loss_atol)
    if f64_oracle:
        from reference_harness import install_f64_support

        ref64 = ref_factory()  # may (re-)install the f32 ROIAlign shim
        install_f64_support()  # wrap it for double inputs AFTER that
        ref64 = ref64.double()
        ref64.train()
        images = make_ref_images()
        images["cur"].tensors = images["cur"].tensors.double()
        for r in images.get("ref", []):
            r.tensors = r.tensors.double()
        losses64 = ref64(images, [_ref_target(H_M, W_M)])
        sum(losses64.values()).backward()
        _grad_compare(ref64, our_grads, base_tol=f64_tol)
    else:
        cond = _cond_movement(gradf, params, our_grads) if use_cond else None
        _grad_compare(ref_model, our_grads, cond_tree=cond)


@pytest.mark.slow
def test_dff_train_parity():
    """DFF train step: losses AND gradients — through FlowNetS, the bilinear
    warp and the scale-map modulation (generalized_rcnn_dff.py:61-95) — match
    the reference's autograd, with gradients pinned against the reference's
    FLOAT64 backward to 1e-4 (torch's own f32 backward is the noisier of the
    two stacks here — see _run_train_parity)."""
    from mega_pytorch_tpu.models.detectors.dff import GeneralizedRCNNDFF
    from mega_pytorch_tpu.models.detectors.rdn import VidConfig

    frames = _video_frames(seed=31)
    load_reference()
    from mega_core.modeling.detector import build_detection_model
    from test_parity_reference import _temper

    def ref_factory():
        torch.manual_seed(0)
        cfg = _ref_train_cfg()
        cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNNDFF"
        cfg.MODEL.VID.ENABLE = True
        cfg.MODEL.VID.METHOD = "dff"
        # tempered like every video parity test: both stacks ingest the SAME
        # weights so parity is unaffected (see _ref_mega_model notes)
        m = _temper(build_detection_model(cfg))
        m.train()
        return m

    model = GeneralizedRCNNDFF(c=_our_train_cfg(), v=VidConfig(method="dff"))
    _run_train_parity(
        ref_factory,
        model,
        lambda: {
            "cur": _il_frames(frames, 0),
            "ref": [_il_frames(frames, 1)],
        },
        _our_frames(frames, [0, 1]),
        f64_oracle=True,
    )


@pytest.mark.slow
def test_fgfa_train_parity():
    """FGFA train step: losses AND gradients — through FlowNetS flow to every
    ref, the warp, EmbedNet and the softmaxed cosine aggregation weights
    (generalized_rcnn_fgfa.py:107-142) — match the reference's autograd."""
    from mega_pytorch_tpu.models.detectors.fgfa import GeneralizedRCNNFGFA
    from mega_pytorch_tpu.models.detectors.rdn import VidConfig

    frames = _video_frames(seed=33)
    load_reference()
    from mega_core.modeling.detector import build_detection_model
    from test_parity_reference import _temper

    def ref_factory():
        torch.manual_seed(0)
        cfg = _ref_train_cfg()
        cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNNFGFA"
        cfg.MODEL.VID.ENABLE = True
        cfg.MODEL.VID.METHOD = "fgfa"
        m = _temper(build_detection_model(cfg))
        m.train()
        return m

    model = GeneralizedRCNNFGFA(c=_our_train_cfg(), v=VidConfig(method="fgfa"))
    _run_train_parity(
        ref_factory,
        model,
        lambda: {
            "cur": _il_frames(frames, 0),
            "ref": [_il_frames(frames, 1), _il_frames(frames, 2)],
        },
        _our_frames(frames, [0, 1, 2]),
        use_cond=True,
    )


@pytest.mark.slow
def test_rdn_train_parity():
    """RDN train step (key RPN + ref RPN on cur and refs, stacked relation
    attention in the box head, generalized_rcnn_rdn.py:75-106): losses AND
    gradients match — in particular the stop_gradient on the ref-RPN path
    (rpn.py:240-243). Gradient tolerances are conditioning-bounded like MEGA's
    (stacked attention-softmax backward is fp32-chaotic; see _grad_compare)."""
    from mega_pytorch_tpu.models.detectors.rdn import GeneralizedRCNNRDN, VidConfig

    frames = _video_frames(seed=35)
    load_reference()
    from mega_core.modeling.detector import build_detection_model
    from test_parity_reference import _temper

    def ref_factory():
        torch.manual_seed(0)
        cfg = _ref_train_cfg()
        cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNNRDN"
        cfg.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR = "RDNFeatureExtractor"
        cfg.MODEL.VID.ENABLE = True
        cfg.MODEL.VID.METHOD = "rdn"
        cfg.MODEL.VID.ROI_BOX_HEAD.ATTENTION.ENABLE = True
        cfg.MODEL.VID.ROI_BOX_HEAD.ATTENTION.STAGE = STAGES_TRAIN
        cfg.MODEL.VID.RPN.REF_PRE_NMS_TOP_N = 300
        cfg.MODEL.VID.RPN.REF_POST_NMS_TOP_N = REF_POST_TRAIN
        m = _temper(build_detection_model(cfg))
        m.train()
        return m

    c = _our_train_cfg(
        ref_pre_nms_top_n=300, ref_post_nms_top_n=REF_POST_TRAIN,
    )
    v = VidConfig(method="rdn", base_stage=STAGES_TRAIN, advanced_stage=0)
    model = GeneralizedRCNNRDN(c=c, v=v)
    _run_train_parity(
        ref_factory,
        model,
        lambda: {
            "cur": _il_frames(frames, 0),
            "ref": [_il_frames(frames, 1), _il_frames(frames, 2)],
        },
        _our_frames(frames, [0, 1, 2]),
        loss_atol=5e-4,
        use_cond=True,
    )
