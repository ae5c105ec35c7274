"""Backbone parity and shape tests.

Torch oracles (clean-room from the architecture spec in
mega_core/modeling/backbone/resnet.py) validate layout conversion, stride
placement, frozen BN, dilation, and deconv semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mega_pytorch_tpu.models.backbone import (
    FlowNetS,
    EmbedNet,
    ResNetC4,
    ResNetRes5Head,
)
from mega_pytorch_tpu.models.backbone.resnet import Bottleneck, Stem
from mega_pytorch_tpu.utils.torch_ingest import ingest_state_dict
from mega_pytorch_tpu.utils.misc import jit_init


class TorchFrozenBN(torch.nn.Module):
    def __init__(self, n):
        super().__init__()
        self.register_buffer("weight", torch.rand(n) + 0.5)
        self.register_buffer("bias", torch.randn(n) * 0.1)
        self.register_buffer("running_mean", torch.randn(n) * 0.1)
        self.register_buffer("running_var", torch.rand(n) + 0.5)

    def forward(self, x):
        scale = self.weight * self.running_var.rsqrt()
        bias = self.bias - self.running_mean * scale
        return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)


class TorchBottleneck(torch.nn.Module):
    def __init__(self, cin, cmid, cout, stride, stride_in_1x1, dilation):
        super().__init__()
        if dilation > 1:
            stride_eff = 1
        else:
            stride_eff = stride
        s1, s3 = (stride_eff, 1) if stride_in_1x1 else (1, stride_eff)
        self.conv1 = torch.nn.Conv2d(cin, cmid, 1, stride=s1, bias=False)
        self.bn1 = TorchFrozenBN(cmid)
        self.conv2 = torch.nn.Conv2d(
            cmid, cmid, 3, stride=s3, padding=dilation, dilation=dilation, bias=False
        )
        self.bn2 = TorchFrozenBN(cmid)
        self.conv3 = torch.nn.Conv2d(cmid, cout, 1, bias=False)
        self.bn3 = TorchFrozenBN(cout)
        self.has_down = cin != cout
        if self.has_down:
            down_stride = stride if dilation == 1 else 1
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride=down_stride, bias=False),
                TorchFrozenBN(cout),
            )

    def forward(self, x):
        idn = self.downsample(x) if self.has_down else x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idn)


def _run_flax(module, params, x_nchw):
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    out = module.apply({"params": params}, x)
    return np.transpose(np.asarray(out), (0, 3, 1, 2))


def test_bottleneck_parity_stride2_with_downsample():
    torch.manual_seed(0)
    tb = TorchBottleneck(64, 64, 256, stride=2, stride_in_1x1=True, dilation=1)
    params = ingest_state_dict(tb.state_dict())
    fb = Bottleneck(
        in_channels=64, bottleneck_channels=64, out_channels=256,
        stride=2, stride_in_1x1=True, dilation=1,
    )
    x = np.random.RandomState(0).randn(2, 64, 16, 16).astype(np.float32)
    with torch.no_grad():
        expected = tb(torch.from_numpy(x)).numpy()
    got = _run_flax(fb, params, x)
    assert got.shape == expected.shape == (2, 256, 8, 8)
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_bottleneck_parity_dilation2():
    torch.manual_seed(1)
    tb = TorchBottleneck(1024, 512, 2048, stride=2, stride_in_1x1=True, dilation=2)
    params = ingest_state_dict(tb.state_dict())
    fb = Bottleneck(
        in_channels=1024, bottleneck_channels=512, out_channels=2048,
        stride=2, stride_in_1x1=True, dilation=2,
    )
    x = np.random.RandomState(1).randn(1, 1024, 8, 8).astype(np.float32)
    with torch.no_grad():
        expected = tb(torch.from_numpy(x)).numpy()
    got = _run_flax(fb, params, x)
    # dilation>1 resets stride to 1: spatial size preserved
    assert got.shape == expected.shape == (1, 2048, 8, 8)
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-3)


def test_stem_parity():
    torch.manual_seed(2)

    class TorchStem(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = TorchFrozenBN(64)

        def forward(self, x):
            x = F.relu(self.bn1(self.conv1(x)))
            return F.max_pool2d(x, 3, stride=2, padding=1)

    ts = TorchStem()
    params = ingest_state_dict(ts.state_dict())
    x = np.random.RandomState(2).randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        expected = ts(torch.from_numpy(x)).numpy()
    got = _run_flax(Stem(64), params, x)
    assert got.shape == expected.shape == (1, 64, 16, 24)
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_deconv_parity():
    """flax ConvTranspose(transpose_kernel=True) must equal torch ConvTranspose2d."""
    torch.manual_seed(3)
    td = torch.nn.ConvTranspose2d(8, 4, kernel_size=4, stride=2)
    from flax import linen as nn
    from mega_pytorch_tpu.utils.torch_ingest import deconv_kernel, to_numpy

    fd = nn.ConvTranspose(4, (4, 4), strides=(2, 2), padding="VALID", transpose_kernel=True)
    params = {
        "kernel": deconv_kernel(to_numpy(td.weight)),
        "bias": to_numpy(td.bias),
    }
    x = np.random.RandomState(3).randn(1, 8, 5, 7).astype(np.float32)
    with torch.no_grad():
        expected = td(torch.from_numpy(x)).numpy()
    got = fd.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == expected.shape == (1, 4, 12, 16)
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_resnet_c4_shapes_and_frozen_grads():
    model = ResNetC4(depth="R-50", freeze_at=2)
    x = jnp.zeros((1, 128, 160, 3))
    params = jit_init(model, jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 8, 10, 1024)  # stride 16, 1024ch

    # layer1 params exist and layer3 block count matches R-50 spec
    assert "layer1" in params and "layer3" in params
    assert set(params["layer3"].keys()) == {str(i) for i in range(6)}

    # stop_gradient: grads w.r.t. stem/layer1 are zero, layer2+ nonzero
    def loss(p):
        return (model.apply({"params": p}, jnp.ones((1, 64, 64, 3))) ** 2).mean()

    g = jax.grad(loss)(params)
    stem_norm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.abs(b).sum(), g["stem"], 0.0
    )
    l2_norm = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.abs(b).sum(), g["layer2"], 0.0
    )
    assert float(stem_norm) == 0.0
    assert float(l2_norm) > 0.0


def test_res5_head_dilated_keeps_resolution():
    head = ResNetRes5Head(depth="R-50", stride_init=1, dilation=2)
    x = jnp.zeros((1, 8, 10, 1024))
    params = jit_init(head, jax.random.PRNGKey(0), x)["params"]
    out = head.apply({"params": params}, x)
    assert out.shape == (1, 8, 10, 2048)


def test_flownet_shapes():
    for method, expect_tuple in (("fgfa", False), ("dff", True)):
        net = FlowNetS(method=method)
        x = jnp.zeros((1, 128, 192, 6))
        params = jit_init(net, jax.random.PRNGKey(0), x)["params"]
        out = net.apply({"params": params}, x)
        if expect_tuple:
            flow, scale = out
            assert flow.shape == (1, 8, 12, 2)
            assert scale.shape == (1, 8, 12, 1024)
            # zero-init conv + 1 → scale map is exactly 1 at init
            np.testing.assert_allclose(np.asarray(scale), 1.0)
        else:
            assert out.shape == (1, 8, 12, 2)


def test_embednet_shapes():
    net = EmbedNet()
    x = jnp.zeros((1, 8, 10, 1024))
    params = jit_init(net, jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (1, 8, 10, 2048)


def test_gn_variant_builds_and_trains_norm_params():
    """BottleneckWithGN / StemWithGN parity: GroupNorm-32 replaces FrozenBN."""
    from mega_pytorch_tpu.models.backbone.resnet import ResNetC4

    model = ResNetC4(depth="R-50", norm="gn", freeze_at=0)
    x = jnp.zeros((1, 64, 64, 3))
    params = jit_init(model, jax.random.PRNGKey(0), x)["params"]
    # GroupNorm params: scale/bias (no running stats)
    bn1 = params["stem"]["bn1"]
    assert set(bn1.keys()) == {"scale", "bias"}
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 4, 4, 1024)


@pytest.mark.parametrize("factor", [2, 4])
def test_s2d_stem_exact(factor):
    """The s2d(2) 4x4/1 and s2d(4) 3x3/1 stem reformulations are exact vs
    the canonical 7x7/2 conv (same params, same output) including the
    zero-padding border and (for factor 4) the fused packed maxpool, and
    the packed normalize matches pack(normalize(unpacked))."""
    from mega_pytorch_tpu.models.backbone.resnet import Stem
    from mega_pytorch_tpu.data.transforms import (
        normalize_u8_frames,
        s2d_pack_frames,
    )

    rng = np.random.RandomState(3)
    h, w = 48, 64
    frames = rng.randint(0, 256, (2, h, w, 3), dtype=np.uint8)
    sizes = np.array([[h, w], [37, 51]], np.float32)  # one padded canvas

    x3 = normalize_u8_frames(jnp.asarray(frames), jnp.asarray(sizes))
    xp = normalize_u8_frames(
        jnp.asarray(s2d_pack_frames(frames, factor)), jnp.asarray(sizes)
    )
    # packed normalize == pack(normalize): phase-aware pad masking
    np.testing.assert_allclose(
        np.asarray(xp), s2d_pack_frames(np.asarray(x3), factor),
        atol=0, rtol=0,
    )

    stem = Stem()
    params = jit_init(stem, jax.random.PRNGKey(0), x3)["params"]
    assert params["conv1"]["kernel"].shape == (7, 7, 3, 64)
    y3 = stem.apply({"params": params}, x3)
    yp = stem.apply({"params": params}, xp)
    assert y3.shape == yp.shape == (2, h // 4, w // 4, 64)
    np.testing.assert_allclose(
        np.asarray(yp), np.asarray(y3), rtol=1e-5, atol=1e-4
    )


def test_stem_pool_packed_kernel_exact():
    """The Pallas stem epilogue (BN affine + relu + packed 3x3/2 maxpool in
    one pass) matches the XLA 6-D shifted-max chain exactly, including the
    -inf borders, block-boundary row halos, and under the engines' lane
    vmap."""
    from mega_pytorch_tpu.ops.pallas.stem_pool import stem_pool_packed

    o, t, u = 8, 12, 16  # t chosen so tile_h splits unevenly (halo path)
    rng = np.random.RandomState(7)
    y = jnp.asarray(rng.randn(2, t, u, 4 * o), jnp.float32)
    scale = jnp.asarray(rng.rand(o) + 0.5, jnp.float32)
    shift = jnp.asarray(rng.randn(o), jnp.float32)

    def xla_chain(y):
        z = jnp.maximum(
            y.reshape(*y.shape[:3], 2, 2, o) * scale + shift, 0.0
        )
        neg = jnp.asarray(jnp.finfo(z.dtype).min, z.dtype)
        prev_r = jnp.concatenate(
            [jnp.full_like(z[:, :1, :, 1], neg), z[:, :-1, :, 1]], axis=1
        )
        r = jnp.maximum(jnp.maximum(z[:, :, :, 0], z[:, :, :, 1]), prev_r)
        prev_c = jnp.concatenate(
            [jnp.full_like(r[:, :, :1, 1], neg), r[:, :, :-1, 1]], axis=2
        )
        return jnp.maximum(jnp.maximum(r[..., 0, :], r[..., 1, :]), prev_c)

    want = xla_chain(y)
    got = stem_pool_packed(
        y, jnp.tile(scale, 4), jnp.tile(shift, 4), o, tile_h=5,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    # vmapped over a leading lane axis (how the lockstep engines call it)
    lanes = jnp.stack([y, y[::-1]])
    got_v = jax.vmap(
        lambda a: stem_pool_packed(
            a, jnp.tile(scale, 4), jnp.tile(shift, 4), o, tile_h=5,
            interpret=True,
        )
    )(lanes)
    np.testing.assert_allclose(
        np.asarray(got_v[0]), np.asarray(want), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_v[1]), np.asarray(xla_chain(y[::-1])), rtol=1e-6
    )


def test_stem_pool_folded_matches_per_frame():
    """The FOLDED stem composition (batch folded into H with one zero input
    row between frames, batch-1 conv, frame_rows-strided pool kernel, junk
    rows sliced) equals the per-frame unfolded path exactly — the layout
    trick resnet.Stem uses on TPU to avoid the conv->kernel relayout.

    Junk seam rows in the pool input are ALSO overwritten with +1e9 poison
    in a second check to prove the frame-boundary halo masking never reads
    them."""
    from mega_pytorch_tpu.models.backbone.resnet import s2d4_stem_kernel
    from mega_pytorch_tpu.ops.pallas.stem_pool import stem_pool_packed

    o, tp, u, n = 8, 14, 16, 3  # s = tp+1 = 15, tile_h 5
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.rand(n, tp, u, 48), jnp.float32)
    w7 = jnp.asarray(rng.randn(7, 7, 3, o) * 0.1, jnp.float32)
    w3 = s2d4_stem_kernel(w7)
    scale = jnp.asarray(np.tile(rng.rand(o) + 0.5, 4), jnp.float32)
    shift = jnp.asarray(np.tile(rng.randn(o), 4), jnp.float32)

    def conv3(z):
        return jax.lax.conv_general_dilated(
            z, w3, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    want = stem_pool_packed(conv3(x), scale, shift, o, tile_h=7,
                            interpret=True)

    s = tp + 1
    strip = jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0))).reshape(
        1, n * s, u, 48
    )
    y = conv3(strip)
    got = stem_pool_packed(
        y, scale, shift, o, tile_h=5, frame_rows=s, interpret=True
    ).reshape(n, s, u, o)[:, :tp]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    # poison the junk seam rows: outputs must be unchanged
    seams = np.arange(s - 1, n * s, s)
    y_poison = np.array(y)
    y_poison[:, seams] = 1e9
    got_p = stem_pool_packed(
        jnp.asarray(y_poison), scale, shift, o, tile_h=5, frame_rows=s,
        interpret=True,
    ).reshape(n, s, u, o)[:, :tp]
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want),
                               rtol=1e-6)
