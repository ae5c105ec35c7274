"""Flow warp (vs torch grid_sample oracle) and loss primitives."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mega_pytorch_tpu.ops import sigmoid_focal_loss, smooth_l1_loss, warp_by_flow


def torch_warp(feat_hwc: np.ndarray, flow_hw2: np.ndarray) -> np.ndarray:
    """The reference's resample() (generalized_rcnn_fgfa.py:45-62) on CPU."""
    h, w, c = feat_hwc.shape
    feats = torch.from_numpy(feat_hwc).permute(2, 0, 1)[None]  # 1CHW
    flow = torch.from_numpy(flow_hw2).permute(2, 0, 1)[None]  # 1,2,H,W
    ys, xs = torch.meshgrid(
        torch.arange(h, dtype=torch.float32),
        torch.arange(w, dtype=torch.float32),
        indexing="ij",
    )
    grid_dst = torch.stack((xs, ys))[None]
    workspace = torch.tensor([(w - 1) / 2, (h - 1) / 2]).view(1, 2, 1, 1)
    grid = ((flow + grid_dst) / workspace - 1).permute(0, 2, 3, 1)
    # no align_corners arg in the reference call; under its pinned torch 1.3
    # that resolves to False (the post-1.3 default) — see ops/warp.py docstring
    out = F.grid_sample(
        feats, grid, mode="bilinear", padding_mode="border", align_corners=False
    )
    return out[0].permute(1, 2, 0).numpy()


def test_warp_matches_grid_sample():
    rng = np.random.RandomState(0)
    feat = rng.randn(12, 20, 6).astype(np.float32)
    flow = (rng.randn(12, 20, 2) * 3).astype(np.float32)
    expected = torch_warp(feat, flow)
    got = np.asarray(warp_by_flow(jnp.asarray(feat), jnp.asarray(flow)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_warp_zero_flow_matches_torch():
    """align_corners=False means zero flow is NOT exact identity in the
    interior (coords rescale by W/(W-1) then shift -0.5); corners stay exact.
    Match torch's own zero-flow result."""
    rng = np.random.RandomState(1)
    feat = rng.randn(8, 8, 3).astype(np.float32)
    flow = np.zeros((8, 8, 2), np.float32)
    got = np.asarray(warp_by_flow(jnp.asarray(feat), jnp.asarray(flow)))
    np.testing.assert_allclose(got, torch_warp(feat, flow), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[0, 0], feat[0, 0], rtol=1e-5)


def test_smooth_l1_matches_reference_math():
    rng = np.random.RandomState(2)
    x = rng.randn(64).astype(np.float32)
    t = rng.randn(64).astype(np.float32)
    beta = 1.0 / 9
    n = np.abs(x - t)
    expected = np.where(n < beta, 0.5 * n**2 / beta, n - 0.5 * beta)
    got = np.asarray(smooth_l1_loss(jnp.asarray(x), jnp.asarray(t), beta))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_focal_loss_matches_torch_reference_impl():
    """Oracle: the reference CPU implementation semantics
    (mega_core/layers/sigmoid_focal_loss.py:40-50)."""
    rng = np.random.RandomState(3)
    logits = rng.randn(32, 5).astype(np.float32)
    targets = rng.randint(-1, 6, 32)  # -1 ignore, 0 bg, 1..5 classes
    gamma, alpha = 2.0, 0.25

    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(targets)
    class_range = torch.arange(1, 6, dtype=tt.dtype)[None]
    t = tt[:, None]
    p = torch.sigmoid(lt)
    term1 = (1 - p) ** gamma * torch.log(p)
    term2 = p**gamma * torch.log(1 - p)
    expected = (
        -(t == class_range).float() * term1 * alpha
        - ((t != class_range) * (t >= 0)).float() * term2 * (1 - alpha)
    ).numpy()

    got = np.asarray(
        sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), gamma, alpha)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
