"""Data pipeline: index/XML parsing, per-method sampling, transforms,
batch assembly, video-boundary sharding, and the VID evaluator."""

import os

import numpy as np
import pytest
from PIL import Image

from mega_pytorch_tpu.data.datasets.vid import (
    VIDDataset,
    VIDDFFDataset,
    VIDMEGADataset,
    VIDRDNDataset,
    parse_vid_xml,
)
from mega_pytorch_tpu.data.evaluation.vid_eval import calc_ap, eval_detection_vid
from mega_pytorch_tpu.data.loader import EvalPreprocessor, TrainPreprocessor
from mega_pytorch_tpu.data.samplers import training_indices, video_shards
from mega_pytorch_tpu.data.transforms import preprocess_image, resize_hw, transform_boxes


def _xml(path, h, w, objs):
    items = "".join(
        f"<object><name>{wnid}</name><bndbox>"
        f"<xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax>"
        f"</bndbox></object>"
        for (wnid, x1, y1, x2, y2) in objs
    )
    with open(path, "w") as f:
        f.write(
            f"<annotation><size><height>{h}</height><width>{w}</width></size>{items}</annotation>"
        )


@pytest.fixture(scope="module")
def vid_root(tmp_path_factory):
    """Two tiny videos (4 frames each) in the reference directory layout."""
    root = tmp_path_factory.mktemp("ILSVRC")
    img_dir = root / "Data" / "VID"
    anno_dir = root / "Annotations" / "VID"
    lines_train, lines_val = [], []
    rng = np.random.RandomState(0)
    for v in range(2):
        folder = f"val/vid_{v:04d}"
        (img_dir / folder).mkdir(parents=True, exist_ok=True)
        (anno_dir / folder).mkdir(parents=True, exist_ok=True)
        for f in range(4):
            arr = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / folder / f"{f:06d}.JPEG")
            objs = [("n02691156", 10 + f, 12, 30 + f, 40)] if (v, f) != (1, 2) else []
            _xml(anno_dir / folder / f"{f:06d}.xml", 60, 80, objs)
            lines_val.append(f"{folder} {4 * v + f + 1} {f} 4")
        lines_train.append(f"{folder} 1 1 4")
    sets = root / "ImageSets"
    sets.mkdir()
    (sets / "val.txt").write_text("\n".join(lines_val) + "\n")
    (sets / "train.txt").write_text("\n".join(lines_train) + "\n")
    return root


def _args(root, split, is_train):
    return dict(
        image_set=f"VID_{split}",
        data_dir=str(root),
        img_dir=str(root / "Data" / "VID"),
        anno_path=str(root / "Annotations" / "VID"),
        img_index=str(root / "ImageSets" / f"{split}.txt"),
        is_train=is_train,
    )


def test_xml_parse_and_clamp(tmp_path):
    p = tmp_path / "a.xml"
    _xml(p, 50, 70, [("n02691156", -5, 3, 100, 45), ("n99999999", 1, 1, 2, 2)])
    anno = parse_vid_xml(str(p))
    assert anno["im_info"] == (50, 70)
    assert len(anno["boxes"]) == 1  # unknown wnid dropped
    np.testing.assert_allclose(anno["boxes"][0], [0, 3, 69, 45])
    assert anno["labels"][0] == 1


def test_vid_dataset_index_and_cache(vid_root):
    ds = VIDDataset(**_args(vid_root, "val", is_train=False))
    assert len(ds) == 8
    assert ds.is_video
    assert ds.frame_seg_len[0] == 4
    info = ds.get_img_info(0)
    assert (info["height"], info["width"]) == (60, 80)
    # cache file created and reload works
    assert os.path.exists(os.path.join(str(vid_root), "cache", "VID_val_anno.npz"))
    ds2 = VIDDataset(**_args(vid_root, "val", is_train=False))
    assert len(ds2.annos) == 8


def test_train_filters_empty_annotations(vid_root):
    ds = VIDDataset(**_args(vid_root, "val", is_train=True))
    assert len(ds) == 7  # (1, 2) had no objects


def test_mega_dataset_samples(vid_root):
    ds = VIDMEGADataset(
        **_args(vid_root, "val", is_train=True),
        ref_num_local=2, ref_num_mem=2, ref_num_global=2,
        rng=np.random.RandomState(0),
    )
    s = ds[0]
    assert len(s["ref_l"]) == 2 and len(s["ref_m"]) == 2 and len(s["ref_g"]) == 2
    assert s["gt"]["boxes"].shape == (1, 4)

    ds_test = VIDMEGADataset(
        **_args(vid_root, "val", is_train=False),
        global_size=3, global_seed=0,
    )
    s0 = ds_test[0]
    assert s0["frame_category"] == 0 and len(s0["ref_g"]) == 3
    s1 = ds_test[1]
    assert s1["frame_category"] == 1 and len(s1["ref_g"]) == 1
    # deterministic schedule under a fixed seed
    ds_test2 = VIDMEGADataset(
        **_args(vid_root, "val", is_train=False), global_size=3, global_seed=0
    )
    assert (ds_test.shuffled_index[0] == ds_test2.shuffled_index[0]).all()


def test_rdn_dff_samples(vid_root):
    rdn = VIDRDNDataset(**_args(vid_root, "val", is_train=True), rng=np.random.RandomState(1))
    assert len(rdn[0]["ref"]) == 2
    dff = VIDDFFDataset(**_args(vid_root, "val", is_train=False))
    s = dff[0]
    assert s["is_key_frame"] in (True, False)
    assert dff[0]["is_key_frame"]  # frame 0 is key


def test_resize_rule_and_boxes():
    # the reference's get_size rule: int() truncation on the long side
    assert resize_hw(720, 1280, 600, 1000) == (562, 999)
    assert resize_hw(600, 800, 600, 1000) == (600, 800)
    boxes = np.array([[10.0, 20.0, 100.0, 200.0]])
    out = transform_boxes(boxes, 720, 1280, 562, 999, flip=False)
    np.testing.assert_allclose(out[0], [10 * 999 / 1280, 20 * 562 / 720, 100 * 999 / 1280, 200 * 562 / 720])
    flipped = transform_boxes(boxes, 720, 1280, 562, 999, flip=True)
    assert flipped[0, 0] == 999 - out[0, 2] - 1


def test_preprocess_canvas_and_normalization():
    img = Image.fromarray(np.full((60, 80, 3), 128, np.uint8))
    p = preprocess_image(img, 600, 1000, flip=False, canvas_short=608, canvas_long=1024)
    assert p.image.shape == (608, 1024, 3)
    np.testing.assert_allclose(p.size, [600, 800])
    # normalized BGR255: value = 128 - mean
    np.testing.assert_allclose(p.image[0, 0], 128 - np.array([102.9801, 115.9465, 122.7717]), atol=0.6)
    # padding region is zero
    np.testing.assert_allclose(p.image[601:, :, :], 0)
    # portrait gets the tall canvas
    p2 = preprocess_image(
        Image.fromarray(np.zeros((80, 60, 3), np.uint8)), 600, 1000, False, 608, 1024
    )
    assert p2.image.shape == (1024, 608, 3)


def test_train_preprocessor_groups(vid_root):
    ds = VIDMEGADataset(
        **_args(vid_root, "val", is_train=True),
        ref_num_local=2, ref_num_mem=1, ref_num_global=1,
        rng=np.random.RandomState(0),
    )
    prep = TrainPreprocessor(max_gt=8, rng=np.random.RandomState(0))
    out = prep(ds[0])
    assert out["cur"].shape == (1, 608, 1024, 3)
    assert out["ref_l"].shape == (2, 608, 1024, 3)
    assert out["gt"]["boxes"].shape == (1, 8, 4)
    assert out["gt"]["valid"][0].sum() == 1


def test_training_indices_grouping():
    groups = [0] * 10 + [1] * 6
    batches = []
    gen = training_indices(16, groups, batch_size=2, max_iter=12, seed=0)
    for b in gen:
        batches.append(b)
    assert len(batches) == 12
    for b in batches:
        assert len(b) == 2
        assert groups[b[0]] == groups[b[1]]  # never mixes orientations


def test_video_shards():
    starts = [0, 10, 25, 40]
    shards = video_shards(starts, total=50, num_shards=3)
    assert sum(len(s) for s in shards) == 50
    flat = [i for s in shards for i in s]
    assert flat == list(range(50))
    for s in shards[1:]:
        if s:
            assert s[0] in starts  # every shard begins at a video start


def test_evaluator_perfect_and_half():
    gt = [
        {"boxes": np.array([[10.0, 10.0, 50.0, 50.0]]), "labels": np.array([1])},
        {"boxes": np.array([[20.0, 20.0, 80.0, 90.0]]), "labels": np.array([2])},
    ]
    perfect = [
        {"boxes": g["boxes"], "labels": g["labels"], "scores": np.array([0.9])}
        for g in gt
    ]
    res = eval_detection_vid(gt, perfect)
    assert res["all"]["map"] == pytest.approx(1.0)

    # miss the second image entirely → class 2 AP 0, class 1 AP 1
    half = [perfect[0], {"boxes": np.zeros((0, 4)), "labels": np.zeros(0, int), "scores": np.zeros(0)}]
    res2 = eval_detection_vid(gt, half)
    ap = res2["all"]["ap"]
    assert ap[1] == pytest.approx(1.0)
    assert ap[2] == pytest.approx(0.0)

    # false positive with higher score than the true positive hurts precision
    fp = [
        {
            "boxes": np.array([[10.0, 10.0, 50.0, 50.0], [200.0, 200.0, 220.0, 230.0]]),
            "labels": np.array([1, 1]),
            "scores": np.array([0.5, 0.99]),
        },
        perfect[1],
    ]
    res3 = eval_detection_vid(gt, fp)
    assert res3["all"]["ap"][1] == pytest.approx(0.5)


def test_evaluator_motion_ignore():
    gt = [{"boxes": np.array([[10.0, 10.0, 50.0, 50.0]]), "labels": np.array([1])}]
    pred = [{"boxes": gt[0]["boxes"], "labels": np.array([1]), "scores": np.array([0.9])}]
    # motion iou 0.95 → "slow"; in fast range the object is ignored → nan AP
    mious = [np.array([0.95])]
    res = eval_detection_vid(gt, pred, motion_ious=mious)
    assert res["slow"]["map"] == pytest.approx(1.0)
    assert np.isnan(res["fast"]["ap"][1])
    assert res["all"]["map"] == pytest.approx(1.0)


def test_coco_dataset(tmp_path):
    import json

    from mega_pytorch_tpu.data.datasets.coco_voc import COCODataset

    (tmp_path / "imgs").mkdir()
    Image.fromarray(np.zeros((40, 50, 3), np.uint8)).save(tmp_path / "imgs" / "a.jpg")
    Image.fromarray(np.zeros((40, 50, 3), np.uint8)).save(tmp_path / "imgs" / "b.jpg")
    ann = {
        "images": [
            {"id": 7, "file_name": "a.jpg", "height": 40, "width": 50},
            {"id": 9, "file_name": "b.jpg", "height": 40, "width": 50},
        ],
        "annotations": [
            {"id": 1, "image_id": 7, "category_id": 18, "bbox": [10, 10, 20, 15], "iscrowd": 0},
            {"id": 2, "image_id": 7, "category_id": 3, "bbox": [5, 5, 8, 8], "iscrowd": 0},
        ],
        "categories": [{"id": 3, "name": "car"}, {"id": 18, "name": "dog"}],
    }
    f = tmp_path / "ann.json"
    f.write_text(json.dumps(ann))

    ds = COCODataset(str(f), str(tmp_path / "imgs"))
    assert len(ds) == 1  # image 9 has no annotations
    s = ds[0]
    gt = s["gt"]
    assert gt["boxes"].shape == (2, 4)
    np.testing.assert_allclose(gt["boxes"][0], [10, 10, 29, 24])  # xywh→xyxy (-1)
    # contiguous ids: cat 3 → 1, cat 18 → 2
    assert sorted(gt["labels"].tolist()) == [1, 2]

    ds_all = COCODataset(str(f), str(tmp_path / "imgs"), remove_images_without_annotations=False)
    assert len(ds_all) == 2


def test_voc_dataset(tmp_path):
    from mega_pytorch_tpu.data.datasets.coco_voc import PascalVOCDataset

    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "Annotations").mkdir()
    (tmp_path / "ImageSets" / "Main").mkdir(parents=True)
    Image.fromarray(np.zeros((30, 40, 3), np.uint8)).save(tmp_path / "JPEGImages" / "000001.jpg")
    (tmp_path / "Annotations" / "000001.xml").write_text(
        "<annotation><size><height>30</height><width>40</width></size>"
        "<object><name>dog</name><difficult>0</difficult><bndbox>"
        "<xmin>11</xmin><ymin>6</ymin><xmax>21</xmax><ymax>16</ymax></bndbox></object>"
        "</annotation>"
    )
    (tmp_path / "ImageSets" / "Main" / "train.txt").write_text("000001\n")
    ds = PascalVOCDataset(str(tmp_path), "train")
    s = ds[0]
    np.testing.assert_allclose(s["gt"]["boxes"][0], [10, 5, 20, 15])  # 1-indexed → 0
    assert ds.map_class_id_to_class_name(int(s["gt"]["labels"][0])) == "dog"


def test_native_loader_matches_pil_path(tmp_path):
    """C++ decode/resize/normalize tracks the PIL path within filter tolerance
    and beats it on throughput for batches."""
    import time

    from mega_pytorch_tpu.data import native_loader

    if not native_loader.available():
        import pytest as _pytest

        _pytest.skip("native toolchain unavailable")

    rng = np.random.RandomState(0)
    img = (rng.rand(120, 160, 3) * 255).astype(np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(img).save(p, quality=95)

    pil = Image.open(p).convert("RGB")
    ref = preprocess_image(pil, 60, 100, flip=False, canvas_short=64, canvas_long=100)
    out, (oh, ow) = native_loader.load_frame(str(p), 60, 100, False, 64, 100)
    assert (oh, ow) == (int(ref.size[0]), int(ref.size[1]))
    # same resampling family (triangle); small numeric differences allowed
    diff = np.abs(out[:oh, :ow] - ref.image[:oh, :ow])
    assert diff.mean() < 2.0, diff.mean()
    # padding region identical (zero)
    np.testing.assert_allclose(out[oh:, :, :], 0)

    # flip parity
    out_f, _ = native_loader.load_frame(str(p), 60, 100, True, 64, 100)
    ref_f = preprocess_image(pil, 60, 100, flip=True, canvas_short=64, canvas_long=100)
    assert np.abs(out_f[:oh, :ow] - ref_f.image[:oh, :ow]).mean() < 2.0

    # batch API
    paths = [str(p)] * 8
    outs, hws = native_loader.load_batch(paths, 60, 100, [False] * 8, 64, 100)
    assert outs.shape == (8, 64, 100, 3)
    np.testing.assert_allclose(outs[3], out, atol=1e-5)
    np.testing.assert_allclose(hws[0], [oh, ow])
