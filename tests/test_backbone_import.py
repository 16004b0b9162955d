"""Raw pretrained-backbone importers vs torch oracles.

The reference boots its backbones from public torch weights: timm
``tf_efficientnetv2_s_in21ft1k`` blocks (reference:
networks/EfficientSATRN.py:63-87) and Microsoft's
``swin_base_patch4_window12_384_22k.pth`` (networks/SWIN.py:1028-1034).
timm isn't installed here, so each test builds a torch mirror with the
exact timm/hub module names and key layout, randomizes its weights,
converts the state_dict with our importer, and asserts the flax forward
matches the torch forward value-for-value. This validates the key maps,
the layout transposes, BN eps/stats handling, and (for Swin) the
window-attention / shifted-mask / patch-merging math itself.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from p4fr_tpu.utils.convert_pth import (  # noqa: E402
    convert_swin_hub,
    convert_timm_efficientnetv2,
    graft_backbone,
)


# ---------------------------------------------------------------------------
# torch mirror of timm's tf_efficientnetv2_s blocks (key-name compatible)
# ---------------------------------------------------------------------------

BN_EPS = 1e-3


class Conv2dSame(tnn.Conv2d):
    """TF-style SAME padding, as in timm's tf_* model variants (and XLA's
    padding="SAME") — asymmetric at stride 2 on even inputs."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        sh, sw = self.stride
        kh, kw = self.kernel_size
        ph = max((math.ceil(ih / sh) - 1) * sh + kh - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class TConvBnAct(tnn.Module):
    def __init__(self, in_chs, out_chs, k, s):
        super().__init__()
        self.conv = Conv2dSame(in_chs, out_chs, k, s, bias=False)
        self.bn1 = tnn.BatchNorm2d(out_chs, eps=BN_EPS)

    def forward(self, x):
        return F.silu(self.bn1(self.conv(x)))


class TEdgeResidual(tnn.Module):
    def __init__(self, in_chs, out_chs, k, s, expand):
        super().__init__()
        mid = in_chs * expand
        self.conv_exp = Conv2dSame(in_chs, mid, k, s, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid, eps=BN_EPS)
        self.conv_pwl = tnn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out_chs, eps=BN_EPS)
        self.has_skip = s == 1 and in_chs == out_chs

    def forward(self, x):
        shortcut = x
        x = F.silu(self.bn1(self.conv_exp(x)))
        x = self.bn2(self.conv_pwl(x))
        return x + shortcut if self.has_skip else x


class TSqueezeExcite(tnn.Module):
    def __init__(self, chs, rd):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(chs, rd, 1)
        self.conv_expand = tnn.Conv2d(rd, chs, 1)

    def forward(self, x):
        g = x.mean((2, 3), keepdim=True)
        g = self.conv_expand(F.silu(self.conv_reduce(g)))
        return x * torch.sigmoid(g)


class TInvertedResidual(tnn.Module):
    def __init__(self, in_chs, out_chs, k, s, expand, se_ratio=0.25):
        super().__init__()
        mid = in_chs * expand
        self.conv_pw = tnn.Conv2d(in_chs, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid, eps=BN_EPS)
        self.conv_dw = Conv2dSame(mid, mid, k, s, groups=mid, bias=False)
        self.bn2 = tnn.BatchNorm2d(mid, eps=BN_EPS)
        self.se = TSqueezeExcite(mid, max(1, int(in_chs * se_ratio)))
        self.conv_pwl = tnn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out_chs, eps=BN_EPS)
        self.has_skip = s == 1 and in_chs == out_chs

    def forward(self, x):
        shortcut = x
        x = F.silu(self.bn1(self.conv_pw(x)))
        x = F.silu(self.bn2(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn3(self.conv_pwl(x))
        return x + shortcut if self.has_skip else x


# (num_repeat, kernel, stride, expand, in, out, se, fused) == V2_S_STAGES
V2S = (
    (2, 3, 1, 1, 24, 24, False, True),
    (4, 3, 2, 4, 24, 48, False, True),
    (4, 3, 2, 4, 48, 64, False, True),
    (6, 3, 2, 4, 64, 128, True, False),
    (9, 3, 1, 6, 128, 160, True, False),
    (15, 3, 2, 6, 160, 256, True, False),
)


class TimmBlocksMirror(tnn.Module):
    """Attribute named ``blocks`` so state_dict keys match timm's."""

    def __init__(self):
        super().__init__()
        stages = []
        for repeats, k, s, e, in_chs, out_chs, use_se, fused in V2S:
            blocks = []
            for b in range(repeats):
                ic = in_chs if b == 0 else out_chs
                ss = s if b == 0 else 1
                if fused and e == 1:
                    blocks.append(TConvBnAct(ic, out_chs, k, ss))
                elif fused:
                    blocks.append(TEdgeResidual(ic, out_chs, k, ss, e))
                else:
                    blocks.append(TInvertedResidual(ic, out_chs, k, ss, e))
            stages.append(tnn.Sequential(*blocks))
        self.blocks = tnn.Sequential(*stages)

    def forward(self, x):
        return self.blocks(x)


def _randomize_bn_stats(module, rng):
    """Non-trivial running stats so batch_stats conversion is exercised."""
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(
                torch.tensor(rng.normal(size=m.running_mean.shape) * 0.1,
                             dtype=torch.float32)
            )
            m.running_var.copy_(
                torch.tensor(1.0 + rng.random(m.running_var.shape) * 0.5,
                             dtype=torch.float32)
            )


def test_timm_efficientnetv2_import_forward_parity():
    from p4fr_tpu.models.efficientnetv2 import EfficientNetV2Blocks

    rng = np.random.default_rng(0)
    mirror = TimmBlocksMirror().eval()
    with torch.no_grad():
        _randomize_bn_stats(mirror, rng)

    params, batch_stats, unmatched = convert_timm_efficientnetv2(
        mirror.state_dict()
    )
    assert unmatched == []

    x = rng.normal(size=(2, 24, 16, 32)).astype(np.float32)
    with torch.no_grad():
        want = mirror(torch.tensor(x)).numpy()  # [B, 256, H/16, W/16]

    flax_blocks = EfficientNetV2Blocks()
    got = flax_blocks.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False,
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_timm_import_grafts_into_aster_cnn():
    """End-to-end bootstrap: converted timm blocks graft into the ASTER
    DeepCNN (encoder/cnn/blocks) and the model still runs."""
    from p4fr_tpu.models.aster import ASTER

    mirror = TimmBlocksMirror().eval()
    params, batch_stats, _ = convert_timm_efficientnetv2(mirror.state_dict())

    model = ASTER(num_classes=245, pad_id=2, sos_id=0, src_dim=48,
                  hidden_dim=48, embedding_dim=48, layer_num=2)
    images = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 64, 256, 3)).astype(np.float32))
    text = jnp.zeros((2, 4), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    grafted = graft_backbone(
        dict(variables), params, batch_stats, ("encoder", "cnn", "blocks")
    )
    logits = model.apply(grafted, images, text, train=False)
    assert np.isfinite(np.asarray(logits)).all()
    # the grafted leaves actually landed
    k = np.asarray(
        grafted["params"]["encoder"]["cnn"]["blocks"]["stage0_block0"]["conv"]["kernel"]
    )
    want = mirror.blocks[0][0].conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(k, want)


def test_graft_backbone_rejects_shape_mismatch():
    from p4fr_tpu.models.aster import ASTER

    mirror = TimmBlocksMirror().eval()
    params, batch_stats, _ = convert_timm_efficientnetv2(mirror.state_dict())
    # corrupt one leaf
    params["stage0_block0"]["conv"]["kernel"] = np.zeros((1, 1, 1, 1), np.float32)

    model = ASTER(num_classes=245, pad_id=2, sos_id=0, src_dim=48,
                  hidden_dim=48, embedding_dim=48, layer_num=2)
    images = jnp.zeros((1, 64, 256, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, jnp.zeros((1, 3), jnp.int32), train=False,
    )
    with pytest.raises(ValueError, match="graft_backbone"):
        graft_backbone(
            dict(variables), params, batch_stats, ("encoder", "cnn", "blocks")
        )


# ---------------------------------------------------------------------------
# torch mirror of the official Swin encoder (hub key-name compatible)
# ---------------------------------------------------------------------------


class TWindowAttention(tnn.Module):
    def __init__(self, dim, window, heads):
        super().__init__()
        self.dim, self.window, self.heads = dim, window, heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02
        )
        coords = torch.stack(
            torch.meshgrid(torch.arange(window), torch.arange(window),
                           indexing="ij")
        ).flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0) + (window - 1)
        idx = rel[..., 0] * (2 * window - 1) + rel[..., 1]
        self.register_buffer("relative_position_index", idx)

    def forward(self, x, mask=None):
        nb, n, c = x.shape
        qkv = self.qkv(x).reshape(nb, n, 3, self.heads, c // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(n, n, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(nb // nw, nw, self.heads, n, n) + mask[
                None, :, None
            ]
            attn = attn.view(nb, self.heads, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(nb, n, c)
        return self.proj(x)


def _twindow_partition(x, w):
    b, h, ww, c = x.shape
    x = x.view(b, h // w, w, ww // w, w, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _twindow_reverse(windows, w, h, ww):
    b = windows.shape[0] // ((h // w) * (ww // w))
    x = windows.view(b, h // w, ww // w, w, w, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, ww, -1)


class TSwinBlock(tnn.Module):
    def __init__(self, dim, resolution, heads, window, shift, mlp_ratio=4.0):
        super().__init__()
        self.resolution, self.window, self.shift = resolution, window, shift
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn = TWindowAttention(dim, window, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = tnn.Linear(int(dim * mlp_ratio), dim)
        if shift > 0:
            h, ww = resolution
            img = torch.zeros(1, h, ww, 1)
            cnt = 0
            for hs in (slice(0, -window), slice(-window, -shift),
                       slice(-shift, None)):
                for ws in (slice(0, -window), slice(-window, -shift),
                           slice(-shift, None)):
                    img[:, hs, ws, :] = cnt
                    cnt += 1
            mw = _twindow_partition(img, window).view(-1, window * window)
            diff = mw.unsqueeze(1) - mw.unsqueeze(2)
            mask = torch.where(diff != 0, torch.tensor(-100.0),
                               torch.tensor(0.0))
            self.register_buffer("attn_mask", mask)
        else:
            self.attn_mask = None

    def forward(self, x):
        h, ww = self.resolution
        b, l, c = x.shape
        shortcut = x
        x = self.norm1(x).view(b, h, ww, c)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        windows = _twindow_partition(x, self.window)
        attn = self.attn(windows, self.attn_mask)
        x = _twindow_reverse(attn, self.window, h, ww)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x.reshape(b, l, c)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + y


class TPatchMerging(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = tnn.LayerNorm(4 * dim, eps=1e-5)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x, resolution):
        h, ww = resolution
        b, l, c = x.shape
        x = x.view(b, h, ww, c)
        x = torch.cat(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2],
             x[:, 1::2, 1::2]],
            dim=-1,
        ).view(b, l // 4, 4 * c)
        return self.reduction(self.norm(x))


class TSwinMirror(tnn.Module):
    """Hub-format Swin: patch_embed.{proj,norm}, layers.{s}.blocks.{b},
    layers.{s}.downsample, norm."""

    def __init__(self, img=32, patch=4, embed=8, depths=(2, 2), heads=(2, 4),
                 window=2):
        super().__init__()
        self.patch = patch
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, embed, patch, patch)
        self.patch_embed.norm = tnn.LayerNorm(embed, eps=1e-5)
        self.layers = tnn.ModuleList()
        res = (img // patch, img // patch)
        dim = embed
        self.plan = []
        for s, depth in enumerate(depths):
            layer = tnn.Module()
            layer.blocks = tnn.ModuleList()
            w = min(window, res[0], res[1])
            for i in range(depth):
                shift = 0 if i % 2 == 0 else (
                    0 if min(res) <= w else w // 2
                )
                layer.blocks.append(
                    TSwinBlock(dim, res, heads[s], w, shift)
                )
            self.plan.append((res, dim))
            if s < len(depths) - 1:
                layer.downsample = TPatchMerging(dim)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2
            self.layers.append(layer)
        self.norm = tnn.LayerNorm(dim, eps=1e-5)

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        for s, layer in enumerate(self.layers):
            for blk in layer.blocks:
                x = blk(x)
            if hasattr(layer, "downsample"):
                x = layer.downsample(x, self.plan[s][0])
        return self.norm(x)


def test_swin_hub_import_forward_parity():
    """Value-level Swin oracle: shifted-window attention with relative
    position bias, additive masks, and patch merging all match torch
    (reference model: networks/SWIN.py:84-430)."""
    from p4fr_tpu.models.swin import SwinEncoder

    torch.manual_seed(0)
    mirror = TSwinMirror().eval()
    params, batch_stats, unmatched = convert_swin_hub(mirror.state_dict())
    assert unmatched == []
    assert batch_stats == {}

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = mirror(torch.tensor(x)).numpy()

    # ape=False: the hub file carries no absolute_pos_embed — in the
    # production bootstrap the (ape=True) model keeps its own init for
    # that param, exactly like the reference's strict=False hub load
    enc = SwinEncoder(img_size=32, patch_size=4, embed_dim=8, depths=(2, 2),
                      num_heads=(2, 4), window=2, drop_path_rate=0.0,
                      ape=False)
    got = np.asarray(
        enc.apply({"params": params},
                  jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_swin_hub_import_grafts_into_swintrn():
    from p4fr_tpu.models.swin import SwinTRN

    torch.manual_seed(1)
    mirror = TSwinMirror().eval()
    params, _, _ = convert_swin_hub(mirror.state_dict())

    model = SwinTRN(
        num_classes=245, pad_id=2, sos_id=0,
        input_height=32, input_width=32,
        dec_src_dim=16, dec_hidden_dim=32, dec_filter_dim=64,
        dec_layer_num=1, dec_head_num=4,
        enc_embed_dim=8, enc_depths=(2, 2), enc_num_heads=(2, 4),
        enc_window=2, enc_drop_path_rate=0.0,
    )
    images = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    text = jnp.zeros((2, 4), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    # the hub file has no absolute_pos_embed; bootstrap_pretrained
    # carries the model's own init through the graft (the reference's
    # strict=False hub-load semantics) — mirror that here
    params = dict(params)
    params["absolute_pos_embed"] = (
        variables["params"]["encoder"]["absolute_pos_embed"]
    )
    grafted = graft_backbone(dict(variables), params, {}, ("encoder",))
    logits = model.apply(grafted, images, text, train=False)
    assert np.isfinite(np.asarray(logits)).all()


def test_bootstrap_pretrained_raises_loudly():
    """A set-but-unusable 'pretrained' config must raise, not silently
    train from random init (a silent no-op costs a full training run)."""
    import pytest

    from p4fr_tpu.utils.convert_pth import bootstrap_pretrained

    with pytest.raises(ValueError, match="mapping"):
        bootstrap_pretrained({}, "EfficientSATRN", "/just/a/string.pth")
    with pytest.raises(ValueError, match="graft point"):
        bootstrap_pretrained({}, "LiteSATRN", {"efficientnetv2": "x.pth"})
    with pytest.raises(ValueError, match="no 'efficientnetv2' entry"):
        bootstrap_pretrained({}, "EfficientSATRN", {"swin": "x.pth"})
