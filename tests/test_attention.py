"""Relation attention parity vs a torch oracle of the reference semantics
(roi_box_feature_extractors.py attention_module_multi_head / position fns)."""

import math

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mega_pytorch_tpu.models.roi_heads.attention import (
    RelationAttention,
    extract_position_matrix,
    position_embedding,
)


def torch_position_embedding(bbox, ref_bbox, feat_dim=64, wave=1000.0):
    xmin, ymin, xmax, ymax = torch.chunk(ref_bbox, 4, dim=1)
    w_r = xmax - xmin + 1
    h_r = ymax - ymin + 1
    cx_r = 0.5 * (xmin + xmax)
    cy_r = 0.5 * (ymin + ymax)
    xmin, ymin, xmax, ymax = torch.chunk(bbox, 4, dim=1)
    w = xmax - xmin + 1
    h = ymax - ymin + 1
    cx = 0.5 * (xmin + xmax)
    cy = 0.5 * (ymin + ymax)
    dx = ((cx - cx_r.t()) / w).abs().add(1e-3).log()
    dy = ((cy - cy_r.t()) / h).abs().add(1e-3).log()
    dw = (w / w_r.t()).log()
    dh = (h / h_r.t()).log()
    pos = torch.stack([dx, dy, dw, dh], dim=2)

    feat_range = torch.arange(0, feat_dim / 8)
    dim_mat = torch.full((len(feat_range),), wave).pow(8.0 / feat_dim * feat_range)
    div = (pos.unsqueeze(3) * 100.0) / dim_mat.view(1, 1, 1, -1)
    emb = torch.cat([div.sin(), div.cos()], dim=3)
    return emb.reshape(emb.shape[0], emb.shape[1], feat_dim)


def torch_attention(roi, ref, pos_emb, Wq, bq, Wk, bk, Wg, bg, Wv, bv, u=None, group=16):
    feat_dim = roi.shape[1]
    d = feat_dim // group
    q = (roi @ Wq.t() + bq).reshape(-1, group, d).permute(1, 0, 2)
    k = (ref @ Wk.t() + bk).reshape(-1, group, d).permute(1, 0, 2)
    aff = torch.bmm(q, k.transpose(1, 2))
    if u is not None:
        aff = aff + torch.bmm(u, k.transpose(1, 2))
    aff = aff / math.sqrt(d)
    if pos_emb is not None:
        # pos_emb (N, M, E); torch conv1x1 64->group == linear on last dim
        pw = F.relu(pos_emb @ Wg.t() + bg)  # (N, M, g)
        aff = (pw.permute(2, 0, 1) + 1e-6).log() + aff
    soft = F.softmax(aff, dim=2)  # (g, N, M)
    out = torch.matmul(soft, ref)  # (g, N, feat)
    # grouped conv: out channel o uses group g=o//d over that group's feat inputs
    n = roi.shape[0]
    cat = out.permute(1, 0, 2).reshape(n, group * feat_dim)
    res = torch.zeros(n, feat_dim)
    for g in range(group):
        seg = cat[:, g * feat_dim:(g + 1) * feat_dim]
        res[:, g * d:(g + 1) * d] = seg @ Wv[g].t()
    return res + bv


def _rand_boxes(rng, n):
    xy = rng.uniform(0, 300, (n, 2))
    wh = rng.uniform(10, 150, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_position_embedding_parity():
    rng = np.random.RandomState(0)
    a = _rand_boxes(rng, 7)
    b = _rand_boxes(rng, 11)
    expected = torch_position_embedding(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    got = np.asarray(position_embedding(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def _make_params_and_oracle(rng, use_u, group=16, feat=64 * 16):
    d = feat // group
    t = lambda *s: torch.from_numpy(rng.randn(*s).astype(np.float32) * 0.05)
    Wq, bq = t(feat, feat), t(feat)
    Wk, bk = t(feat, feat), t(feat)
    Wg, bg = t(group, 64), t(group)
    Wv = t(group, d, feat)  # per-group (out d, in feat)
    bv = t(feat)
    u = t(group, 1, 64) if use_u else None

    params = {
        "Wq": {"kernel": Wq.numpy().T, "bias": bq.numpy()},
        "Wk": {"kernel": Wk.numpy().T, "bias": bk.numpy()},
        "Wg": {"kernel": Wg.numpy().T, "bias": bg.numpy()},
        "Wv_kernel": np.stack([Wv[g].numpy().T for g in range(group)]),  # (g, feat, d)
        "Wv_bias": bv.numpy(),
    }
    if use_u:
        params["u"] = u.numpy()[:, 0, :]
    return params, (Wq, bq, Wk, bk, Wg, bg, Wv, bv, u)


def test_relation_attention_parity_rdn():
    rng = np.random.RandomState(1)
    n, m = 9, 21
    roi = rng.randn(n, 1024).astype(np.float32)
    ref = rng.randn(m, 1024).astype(np.float32)
    pos = torch_position_embedding(
        torch.from_numpy(_rand_boxes(rng, n)), torch.from_numpy(_rand_boxes(rng, m))
    )
    params, (Wq, bq, Wk, bk, Wg, bg, Wv, bv, _) = _make_params_and_oracle(rng, use_u=False)
    expected = torch_attention(
        torch.from_numpy(roi), torch.from_numpy(ref), pos, Wq, bq, Wk, bk, Wg, bg, Wv, bv
    ).numpy()
    mod = RelationAttention(use_position=True, use_u_bias=False)
    got = np.asarray(
        mod.apply(
            {"params": params},
            jnp.asarray(roi),
            jnp.asarray(ref),
            jnp.ones(m, bool),
            pos_emb=jnp.asarray(pos.numpy()),
        )
    )
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


def test_relation_attention_parity_mega_u_bias():
    rng = np.random.RandomState(2)
    n, m = 5, 13
    roi = rng.randn(n, 1024).astype(np.float32)
    ref = rng.randn(m, 1024).astype(np.float32)
    params, (Wq, bq, Wk, bk, Wg, bg, Wv, bv, u) = _make_params_and_oracle(rng, use_u=True)
    # global attention: no position embedding
    expected = torch_attention(
        torch.from_numpy(roi), torch.from_numpy(ref), None, Wq, bq, Wk, bk, Wg, bg, Wv, bv, u=u
    ).numpy()
    mod = RelationAttention(use_position=False, use_u_bias=True)
    got = np.asarray(
        mod.apply({"params": params}, jnp.asarray(roi), jnp.asarray(ref), jnp.ones(m, bool))
    )
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


def test_masking_equals_dropping_refs():
    """Masked-out refs must produce the same output as physically removing them."""
    rng = np.random.RandomState(3)
    n, m = 4, 10
    roi = jnp.asarray(rng.randn(n, 1024), jnp.float32)
    ref = jnp.asarray(rng.randn(m, 1024), jnp.float32)
    boxes_n = jnp.asarray(_rand_boxes(rng, n))
    boxes_m = jnp.asarray(_rand_boxes(rng, m))
    params, _ = _make_params_and_oracle(rng, use_u=True)
    mod = RelationAttention(use_position=True, use_u_bias=True)

    valid = jnp.array([True] * 6 + [False] * 4)
    out_masked = mod.apply({"params": params}, roi, ref, valid, pos_rois=(boxes_n, boxes_m))

    out_dropped = mod.apply(
        {"params": params}, roi, ref[:6], jnp.ones(6, bool), pos_rois=(boxes_n, boxes_m[:6])
    )
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_dropped), rtol=1e-4, atol=1e-4
    )


def test_fused_position_bias_matches_reference_path():
    """Pallas kernel (interpret mode) == XLA fallback == unfused emb@Wg path."""
    from mega_pytorch_tpu.ops.pallas.position_bias import (
        fused_position_bias,
        reference_position_bias,
    )

    rng = np.random.RandomState(5)
    n, m, g = 40, 300, 16
    rois = jnp.asarray(_rand_boxes(rng, n))
    refs = jnp.asarray(_rand_boxes(rng, m))
    wk = jnp.asarray(rng.randn(64, g).astype(np.float32) * 0.05)
    wb = jnp.asarray(rng.randn(g).astype(np.float32) * 0.01)

    ref_out = np.asarray(reference_position_bias(rois, refs, wk, wb))
    # unfused semantics: log(relu(emb @ W + b) + 1e-6)
    emb = position_embedding(rois, refs)
    unfused = np.asarray(
        jnp.log(jnp.maximum(emb @ wk + wb, 0.0) + 1e-6).transpose(2, 0, 1)
    )
    fused = np.asarray(
        fused_position_bias(rois, refs, wk, wb, tile_n=16, tile_m=128, interpret=True)
    )
    assert fused.shape == (g, n, m)
    # compare in weight space (exp of the log bias): log-space error is
    # amplified unboundedly near relu zeros where the weight (≈1e-6) is
    # irrelevant to the softmax outcome. The production path deliberately
    # computes the sinusoid contraction in bf16 (bounded [-1, 1] inputs),
    # so allow bf16-mantissa-level absolute error on the weights.
    np.testing.assert_allclose(np.exp(ref_out), np.exp(unfused), rtol=5e-3, atol=6e-3)
    np.testing.assert_allclose(np.exp(fused), np.exp(ref_out), rtol=5e-3, atol=6e-3)
