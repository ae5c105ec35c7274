"""ImageNet VID / DET datasets (host-side, numpy).

Parity with mega_core/data/datasets/vid.py:21-231 and the per-method variants
(vid_{rdn,mega,fgfa,dff}.py):
  * txt index: DET lines `folder frame_id`; VID lines
    `folder 1 frame_seg_id frame_seg_len`.
  * 30-class wnid→label map; XML annotations with empty-image filtering and a
    cache (npz here instead of pickle).
  * per-method reference-frame sampling for training and streaming metadata
    for testing. Unlike the reference, test samples carry ref frame *paths*
    so the input pipeline prefetches — the model never touches the filesystem
    (the reference reads frames inside the module, generalized_rcnn_*.py).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Callable

import numpy as np
from PIL import Image

VID_CLASSES = (
    "__background__",
    "airplane", "antelope", "bear", "bicycle",
    "bird", "bus", "car", "cattle",
    "dog", "domestic_cat", "elephant", "fox",
    "giant_panda", "hamster", "horse", "lion",
    "lizard", "monkey", "motorcycle", "rabbit",
    "red_panda", "sheep", "snake", "squirrel",
    "tiger", "train", "turtle", "watercraft",
    "whale", "zebra",
)
VID_WNIDS = (
    "__background__",
    "n02691156", "n02419796", "n02131653", "n02834778",
    "n01503061", "n02924116", "n02958343", "n02402425",
    "n02084071", "n02121808", "n02503517", "n02118333",
    "n02510455", "n02342885", "n02374451", "n02129165",
    "n01674464", "n02484322", "n03790512", "n02324045",
    "n02509815", "n02411705", "n01726692", "n02355227",
    "n02129604", "n04468005", "n01662784", "n04530566",
    "n02062744", "n02391049",
)
WNID_TO_LABEL = {w: i for i, w in enumerate(VID_WNIDS)}


def parse_vid_xml(path: str) -> dict:
    """One annotation file → {boxes (N,4), labels (N,), im_info (h, w)}.

    Semantics of _preprocess_annotation (vid.py:139-166): clamp boxes into
    the image, skip unknown wnids."""
    root = ET.parse(path).getroot()
    size = root.find("size")
    h = int(size.find("height").text)
    w = int(size.find("width").text)
    boxes, labels = [], []
    for obj in root.findall("object"):
        wnid = obj.find("name").text.lower().strip()
        if wnid not in WNID_TO_LABEL:
            continue
        bb = obj.find("bndbox")
        boxes.append(
            [
                max(float(bb.find("xmin").text), 0),
                max(float(bb.find("ymin").text), 0),
                min(float(bb.find("xmax").text), w - 1),
                min(float(bb.find("ymax").text), h - 1),
            ]
        )
        labels.append(WNID_TO_LABEL[wnid])
    return {
        "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
        "labels": np.asarray(labels, np.int64),
        "im_info": (h, w),
    }


class VIDDataset:
    """Core single-frame dataset ('base' method)."""

    def __init__(
        self,
        image_set: str,
        data_dir: str,
        img_dir: str,
        anno_path: str,
        img_index: str,
        is_train: bool = True,
        use_cache: bool = True,
        rng: np.random.RandomState | None = None,
    ):
        self.image_set = image_set
        self.det_vid = image_set.split("_")[0]
        self.data_dir = data_dir
        self.is_train = is_train
        self.rng = rng or np.random.RandomState()
        self._img_path = os.path.join(img_dir, "%s.JPEG")
        self._anno_path = os.path.join(anno_path, "%s.xml")

        with open(img_index) as f:
            lines = [x.strip().split(" ") for x in f if x.strip()]
        self.is_video = len(lines[0]) > 2
        if not self.is_video:
            self.image_set_index = [x[0] for x in lines]
            self.frame_id = [int(x[1]) for x in lines]
        else:
            self.image_set_index = ["%s/%06d" % (x[0], int(x[2])) for x in lines]
            self.pattern = [x[0] + "/%06d" for x in lines]
            self.frame_id = [int(x[1]) for x in lines]
            self.frame_seg_id = [int(x[2]) for x in lines]
            self.frame_seg_len = [int(x[3]) for x in lines]

        self.annos = self._load_annos(use_cache)
        if self.is_train:
            keep = [len(a["boxes"]) > 0 for a in self.annos]
            self._filter(keep)
            self.annos = [a for a, k in zip(self.annos, keep) if k]

    # -- construction helpers ------------------------------------------------
    def _filter(self, keep):
        sel = lambda xs: [x for x, k in zip(xs, keep) if k]  # noqa: E731
        self.image_set_index = sel(self.image_set_index)
        self.frame_id = sel(self.frame_id)
        if self.is_video:
            self.pattern = sel(self.pattern)
            self.frame_seg_id = sel(self.frame_seg_id)
            self.frame_seg_len = sel(self.frame_seg_len)

    def _cache_file(self) -> str:
        cache_dir = os.path.join(self.data_dir, "cache")
        os.makedirs(cache_dir, exist_ok=True)
        return os.path.join(cache_dir, self.image_set + "_anno.npz")

    def _load_annos(self, use_cache: bool):
        cache = self._cache_file() if use_cache else None
        if cache and os.path.exists(cache):
            z = np.load(cache, allow_pickle=True)
            return list(z["annos"])
        annos = [
            parse_vid_xml(self._anno_path % name) for name in self.image_set_index
        ]
        if cache:
            try:
                np.savez_compressed(cache, annos=np.asarray(annos, object))
            except OSError:
                pass
        return annos

    # -- access ----------------------------------------------------------------
    def __len__(self):
        return len(self.image_set_index)

    def image_path(self, idx: int) -> str:
        return self._img_path % self.image_set_index[idx]

    def load_image(self, idx: int) -> Image.Image:
        return Image.open(self.image_path(idx)).convert("RGB")

    def load_frame(self, pattern: str, frame: int) -> Image.Image:
        return Image.open(self._img_path % (pattern % frame)).convert("RGB")

    def get_img_info(self, idx: int) -> dict:
        h, w = self.annos[idx]["im_info"]
        return {"height": h, "width": w}

    def get_groundtruth(self, idx: int) -> dict:
        return self.annos[idx]

    # -- samples ------------------------------------------------------------------
    def __getitem__(self, idx: int) -> dict:
        """base method: one frame + its ground truth."""
        return {
            "cur": self.load_image(idx),
            "gt": self.annos[idx],
            "idx": idx,
        }

    # video helpers shared by the method variants
    def _ref_frame(self, idx: int, offset: int) -> Image.Image:
        ref_id = min(max(self.frame_seg_id[idx] + offset, 0), self.frame_seg_len[idx] - 1)
        return self.load_frame(self.pattern[idx], ref_id)

    def _sample_offsets(self, lo: int, hi: int, n: int) -> np.ndarray:
        return self.rng.choice(hi - lo + 1, n, replace=False) + lo

    @staticmethod
    def label_name(class_id: int) -> str:
        return VID_CLASSES[class_id]


class VIDRDNDataset(VIDDataset):
    """vid_rdn.py: train refs from ±MAX_OFFSET; test feeds the frame at
    +MAX_OFFSET (the next window entry)."""

    def __init__(self, *args, min_offset=-18, max_offset=18, ref_num=2, **kw):
        super().__init__(*args, **kw)
        self.min_offset, self.max_offset, self.ref_num = min_offset, max_offset, ref_num

    def __getitem__(self, idx: int) -> dict:
        if self.is_train:
            if self.is_video:
                offsets = self._sample_offsets(self.min_offset, self.max_offset, self.ref_num)
                refs = [self._ref_frame(idx, int(o)) for o in offsets]
            else:
                cur = self.load_image(idx)
                return {"cur": cur, "ref": [cur.copy() for _ in range(self.ref_num)],
                        "gt": self.annos[idx], "idx": idx}
            return {
                "cur": self.load_image(idx),
                "ref": refs,
                "gt": self.annos[idx],
                "idx": idx,
            }
        frame_id = int(self.image_set_index[idx].split("/")[-1])
        return {
            "cur": self.load_image(idx),
            "ref": [self._next_window_frame(idx)],
            "frame_category": 0 if frame_id == 0 else 1,
            "seg_len": self.frame_seg_len[idx],
            "pattern": self.pattern[idx],
            "frame_id": frame_id,
            "gt": self.annos[idx],
            "idx": idx,
        }

    def _next_window_frame(self, idx: int) -> Image.Image:
        frame_id = int(self.image_set_index[idx].split("/")[-1])
        ref_id = min(self.frame_seg_len[idx] - 1, frame_id + self.max_offset)
        return self.load_frame(self.pattern[idx], ref_id)


class VIDMEGADataset(VIDDataset):
    """vid_mega.py: local/memory/global training pools; test adds a per-video
    shuffled global-frame schedule (10 on frame 0, then 1/frame)."""

    def __init__(
        self, *args,
        min_offset=-12, max_offset=12, ref_num_local=2, ref_num_mem=3,
        ref_num_global=2, all_frame_interval=25, global_size=10,
        global_enable=True, memory_enable=True, global_shuffle=True,
        global_seed: int | None = None, **kw,
    ):
        super().__init__(*args, **kw)
        self.min_offset, self.max_offset = min_offset, max_offset
        self.ref_num_local, self.ref_num_mem = ref_num_local, ref_num_mem
        self.ref_num_global = ref_num_global
        self.all_frame_interval = all_frame_interval
        self.global_size = global_size
        self.global_enable = global_enable
        self.memory_enable = memory_enable

        if not self.is_train:
            # per-video shuffled global schedule (vid_mega.py:14-28); seeded
            # for reproducible AP (SURVEY.md §7 "randomized eval protocol")
            g_rng = np.random.RandomState(global_seed)
            self.start_index, self.start_id, self.shuffled_index = [], [], {}
            for i, name in enumerate(self.image_set_index):
                frame_id = int(name.split("/")[-1])
                if frame_id == 0:
                    self.start_index.append(i)
                    shuffled = np.arange(self.frame_seg_len[i])
                    if global_shuffle:
                        g_rng.shuffle(shuffled)
                    self.shuffled_index[i] = shuffled
                    self.start_id.append(i)
                else:
                    self.start_id.append(self.start_index[-1])

    def __getitem__(self, idx: int) -> dict:
        if self.is_train:
            return self._get_train(idx)
        return self._get_test(idx)

    def _get_train(self, idx: int) -> dict:
        cur = self.load_image(idx)
        if self.is_video:
            offs = self._sample_offsets(self.min_offset, self.max_offset, self.ref_num_local)
            ref_l = [self._ref_frame(idx, int(o)) for o in offs]
            ref_m = []
            if self.memory_enable:
                center = max(self.frame_seg_id[idx] - self.all_frame_interval, 0)
                offs = self._sample_offsets(self.min_offset, self.max_offset, self.ref_num_mem)
                for o in offs:
                    rid = min(max(center + int(o), 0), self.frame_seg_len[idx] - 1)
                    ref_m.append(self.load_frame(self.pattern[idx], rid))
            ref_g = []
            if self.global_enable:
                ids = self.rng.choice(self.frame_seg_len[idx], self.ref_num_global, replace=False)
                ref_g = [self.load_frame(self.pattern[idx], int(r)) for r in ids]
        else:
            ref_l = [cur.copy() for _ in range(self.ref_num_local)]
            ref_m = [cur.copy() for _ in range(self.ref_num_mem)] if self.memory_enable else []
            ref_g = [cur.copy() for _ in range(self.ref_num_global)] if self.global_enable else []
        return {
            "cur": cur, "ref_l": ref_l, "ref_m": ref_m, "ref_g": ref_g,
            "gt": self.annos[idx], "idx": idx,
        }

    def global_ref_ids(self, idx: int) -> list[int]:
        """Frame ids of this sample's global updates (the per-video shuffled
        schedule, vid_mega.py:112-120): global_size ids on frame 0, 1 after."""
        if not self.global_enable:
            return []
        frame_id = int(self.image_set_index[idx].split("/")[-1])
        size = self.global_size if frame_id == 0 else 1
        start = self.start_id[idx]
        shuffled = self.shuffled_index[start]
        return [
            int(shuffled[
                (idx - start + self.global_size - j - 1) % self.frame_seg_len[idx]
            ])
            for j in range(size)
        ]

    def _get_test(self, idx: int) -> dict:
        frame_id = int(self.image_set_index[idx].split("/")[-1])
        ref_id = min(self.frame_seg_len[idx] - 1, frame_id + self.max_offset)
        ref_l = [self.load_frame(self.pattern[idx], ref_id)]
        ref_g = [
            self.load_frame(self.pattern[idx], fid)
            for fid in self.global_ref_ids(idx)
        ]
        return {
            "cur": self.load_image(idx),
            "ref_l": ref_l,
            "ref_g": ref_g,
            "frame_category": 0 if frame_id == 0 else 1,
            "seg_len": self.frame_seg_len[idx],
            "pattern": self.pattern[idx],
            "frame_id": frame_id,
            "gt": self.annos[idx],
            "idx": idx,
        }


class VIDFGFADataset(VIDRDNDataset):
    """vid_fgfa.py — RDN-shaped samples with ±9 training offsets."""

    def __init__(self, *args, min_offset=-9, max_offset=9, ref_num=2, **kw):
        super().__init__(
            *args, min_offset=min_offset, max_offset=max_offset, ref_num=ref_num, **kw
        )


class VIDDFFDataset(VIDDataset):
    """vid_dff.py: one ref from [-9, 0] at train; key every 10th frame at test."""

    def __init__(self, *args, min_offset=-9, max_offset=0, key_interval=10, **kw):
        super().__init__(*args, **kw)
        self.min_offset, self.max_offset, self.key_interval = min_offset, max_offset, key_interval

    def __getitem__(self, idx: int) -> dict:
        if self.is_train:
            if self.is_video:
                off = int(self._sample_offsets(self.min_offset, self.max_offset, 1)[0])
                ref = [self._ref_frame(idx, off)]
            else:
                cur = self.load_image(idx)
                return {"cur": cur, "ref": [cur.copy()], "gt": self.annos[idx], "idx": idx}
            return {"cur": self.load_image(idx), "ref": ref, "gt": self.annos[idx], "idx": idx}
        frame_id = int(self.image_set_index[idx].split("/")[-1])
        return {
            "cur": self.load_image(idx),
            "is_key_frame": frame_id % self.key_interval == 0,
            "frame_id": frame_id,
            "seg_len": self.frame_seg_len[idx],
            "pattern": self.pattern[idx],
            "gt": self.annos[idx],
            "idx": idx,
        }
