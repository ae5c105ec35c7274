"""ROIPool and deformable conv (zoo ops) + misc/concat utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from mega_pytorch_tpu.ops.deform_conv import DFConv2d, deform_conv2d
from mega_pytorch_tpu.ops.roi_pool import roi_pool
from mega_pytorch_tpu.utils.misc import jit_init


def np_roi_pool(feat, rois, scale, ph_n, pw_n):
    """Numpy oracle of ROIPool_cuda.cu forward.

    Bin boundaries use the op's epsilon-stabilized semantics (infinite-
    precision floor/ceil at exact multiples): the raw f32 boundaries are
    fusion-order-dependent — e.g. ceil(7 * (18/7f)) is 18 or 19 depending on
    how the compiler contracts — so both the op and this oracle nudge by a
    small epsilon toward the exact result."""
    f32 = np.float64
    h, w, c = feat.shape
    out = np.zeros((len(rois), ph_n, pw_n, c), np.float32)
    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = np.round(roi * f32(scale))
        bw = f32(max(x2 - x1 + 1, 1)) / f32(pw_n)
        bh = f32(max(y2 - y1 + 1, 1)) / f32(ph_n)
        for ph in range(ph_n):
            for pw in range(pw_n):
                hs = int(np.clip(np.floor(f32(ph) * bh + 1e-4) + y1, 0, h))
                he = int(np.clip(np.ceil(f32(ph + 1) * bh - 1e-4) + y1, 0, h))
                ws = int(np.clip(np.floor(f32(pw) * bw + 1e-4) + x1, 0, w))
                we = int(np.clip(np.ceil(f32(pw + 1) * bw - 1e-4) + x1, 0, w))
                if he > hs and we > ws:
                    out[r, ph, pw] = feat[hs:he, ws:we].reshape(-1, c).max(axis=0)
    return out


def test_roi_pool_matches_oracle():
    rng = np.random.RandomState(0)
    feat = rng.randn(20, 28, 6).astype(np.float32)
    rois = np.array(
        [
            [0.0, 0.0, 100.0, 100.0],
            [32.0, 16.0, 300.0, 250.0],
            [100.0, 50.0, 130.0, 80.0],
        ],
        np.float32,
    )
    expected = np_roi_pool(feat, rois, 1 / 16.0, 7, 7)
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 1 / 16.0, 7, 7))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_deform_conv_zero_offsets_is_plain_conv():
    """Δp = 0 and mask = 1 must reduce to a standard 3x3 same conv."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(10, 12, 4), jnp.float32)
    weight = jnp.asarray(rng.randn(3, 3, 4, 5).astype(np.float32) * 0.1)
    offsets = jnp.zeros((10, 12, 18))
    got = deform_conv2d(x, offsets, weight)

    expected = jax.lax.conv_general_dilated(
        x[None], weight, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    # border rows differ: deform-conv border-clamps while conv zero-pads
    np.testing.assert_allclose(
        np.asarray(got)[1:-1, 1:-1], np.asarray(expected)[1:-1, 1:-1],
        rtol=1e-4, atol=1e-4,
    )


def test_dfconv2d_module_v1_v2():
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 10, 6), jnp.float32)
    for modulated in (False, True):
        m = DFConv2d(features=7, with_modulated_dcn=modulated, deformable_groups=2)
        p = jit_init(m, jax.random.PRNGKey(0), x)["params"]
        out = m.apply({"params": p}, x)
        assert out.shape == (1, 8, 10, 7)
        assert np.isfinite(np.asarray(out)).all()
        # zero-init offset conv ⇒ v1 starts as a plain conv (v2 scales by
        # 2*sigmoid(0) = 1, also plain)
        flat = np.asarray(out)
        assert np.abs(flat).sum() > 0


def test_concat_and_list_datasets():
    from mega_pytorch_tpu.data.datasets.concat import ConcatDataset, ListDataset
    from PIL import Image

    items = [
        {
            "image": Image.new("RGB", (20, 10)),
            "boxes": np.array([[1.0, 1.0, 5.0, 5.0]]),
            "labels": np.array([2]),
            "height": 10,
            "width": 20,
        }
        for _ in range(3)
    ]
    a, b = ListDataset(items[:2]), ListDataset(items[2:])
    cat = ConcatDataset([a, b])
    assert len(cat) == 3
    assert cat.get_idxs(2) == (1, 0)
    assert cat[2]["gt"]["labels"][0] == 2
    assert cat.get_img_info(0) == {"height": 10, "width": 20}


def test_misc_utils(tmp_path):
    from mega_pytorch_tpu.config import get_default_cfg
    from mega_pytorch_tpu.utils.misc import (
        collect_env_info,
        resolve_weight,
        save_config,
        save_labels,
    )

    save_labels(["bg", "car"], str(tmp_path))
    import json

    with open(tmp_path / "labels.json") as f:
        assert json.load(f)["1"] == "car"

    save_config(get_default_cfg(), str(tmp_path / "config.yml"))
    assert (tmp_path / "config.yml").read_text().startswith("AMP_VERBOSE")

    assert "jax:" in collect_env_info()
    assert resolve_weight("catalog://ImageNetPretrained/MSRA/R-50").endswith("R-50.pkl")
    assert resolve_weight("/abs/path.pth") == "/abs/path.pth"
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        resolve_weight("https://example.com/w.pth")
