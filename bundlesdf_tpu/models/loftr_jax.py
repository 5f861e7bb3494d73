"""LoFTR-class detector-free transformer matcher, TPU-native (flax).

Architecture parity with the vendored reference LoFTR
(BundleTrack/LoFTR/src/loftr/): ResNet-FPN 8_2 backbone
(backbone/resnet_fpn.py), 2D sine positional encoding
(utils/position_encoding.py, temp_bug_fix=True), coarse
LocalFeatureTransformer with 4x(self,cross) linear-attention layers
(loftr_module/transformer.py, linear_attention.py), dual-softmax coarse
matching at temperature 0.1 (utils/coarse_matching.py), 5x5-window fine
preprocess with coarse-feature concat (loftr_module/fine_preprocess.py),
1x(self,cross) fine transformer, and expectation-over-heatmap fine
refinement (utils/fine_matching.py).

TPU-first differences from the torch original:
  * NHWC convs, bf16-friendly matmuls;
  * fixed-capacity matching: instead of boolean indexing, coarse matches
    are selected with a static top-K (K = max_matches) + validity mask, so
    the whole matcher jits with static shapes and batches over pairs;
  * the fine stage gathers K windows unconditionally (masked), no dynamic
    M.

``convert_torch_state_dict`` maps the reference checkpoint
(outdoor_ds.ckpt-style state dict) onto this module's params, so
pretrained weights transfer without retraining.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class LoftrCfg(NamedTuple):
    initial_dim: int = 128
    block_dims: Sequence[int] = (128, 196, 256)
    d_coarse: int = 256
    d_fine: int = 128
    nhead: int = 8
    coarse_pairs: int = 4   # x (self, cross)
    fine_pairs: int = 1
    window: int = 5
    dsmax_temp: float = 0.1
    thr: float = 0.2
    border_rm: int = 2
    max_matches: int = 512
    # The shipped reference pipeline builds LoFTR from cvpr_ds_config
    # (loftr_wrapper.py:21 uses `default_cfg` = cvpr_ds_config, which sets
    # TEMP_BUG_FIX = False) because the released outdoor_ds.ckpt was trained
    # with the buggy positional-encoding temperature.  Default to that
    # variant so converted reference checkpoints are numerically faithful.
    temp_bug_fix: bool = False


# ---------------------------------------------------------------- backbone
class BasicBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, name="bn2")(y)
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, padding=0,
                        use_bias=False, name="down_conv")(x)
            x = nn.BatchNorm(use_running_average=True, name="down_bn")(x)
        return nn.relu(x + y)


def _upsample2x(x):
    """Bilinear 2x upsample with align_corners=True (torch F.interpolate
    parity, resnet_fpn.py:110).  jax.image.resize uses half-pixel centers,
    so interpolate explicitly: out[i] samples src at i*(n_in-1)/(n_out-1)."""
    B, H, W, C = x.shape

    def axis(n_in, n_out):
        src = jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))
        i0 = jnp.floor(src).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        w = (src - i0).astype(x.dtype)
        return i0, i1, w

    y0, y1, wy = axis(H, 2 * H)
    x0, x1, wx = axis(W, 2 * W)
    top = x[:, y0] * (1 - wy)[None, :, None, None] + x[:, y1] * wy[None, :, None, None]
    out = (top[:, :, x0] * (1 - wx)[None, None, :, None]
           + top[:, :, x1] * wx[None, None, :, None])
    return out


class ResNetFPN82(nn.Module):
    """ResNet+FPN, outputs 1/8 (coarse, block_dims[2]) and 1/2 (fine,
    block_dims[0]) feature maps.  NHWC."""
    cfg: LoftrCfg

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x0 = nn.Conv(c.initial_dim, (7, 7), strides=2, padding=3, use_bias=False,
                     name="conv1")(x)
        x0 = nn.BatchNorm(use_running_average=True, name="bn1")(x0)
        x0 = nn.relu(x0)
        x1 = BasicBlock(c.block_dims[0], 1, name="layer1_0")(x0)
        x1 = BasicBlock(c.block_dims[0], 1, name="layer1_1")(x1)
        x2 = BasicBlock(c.block_dims[1], 2, name="layer2_0")(x1)
        x2 = BasicBlock(c.block_dims[1], 1, name="layer2_1")(x2)
        x3 = BasicBlock(c.block_dims[2], 2, name="layer3_0")(x2)
        x3 = BasicBlock(c.block_dims[2], 1, name="layer3_1")(x3)

        x3_out = nn.Conv(c.block_dims[2], (1, 1), use_bias=False,
                         name="layer3_outconv")(x3)
        x2_out = nn.Conv(c.block_dims[2], (1, 1), use_bias=False,
                         name="layer2_outconv")(x2)
        h = x2_out + _upsample2x(x3_out)
        h = nn.Conv(c.block_dims[2], (3, 3), padding=1, use_bias=False,
                    name="layer2_outconv2_0")(h)
        h = nn.BatchNorm(use_running_average=True, name="layer2_outconv2_bn")(h)
        h = nn.leaky_relu(h, 0.01)
        x2_out = nn.Conv(c.block_dims[1], (3, 3), padding=1, use_bias=False,
                         name="layer2_outconv2_1")(h)
        x1_out = nn.Conv(c.block_dims[1], (1, 1), use_bias=False,
                         name="layer1_outconv")(x1)
        h = x1_out + _upsample2x(x2_out)
        h = nn.Conv(c.block_dims[1], (3, 3), padding=1, use_bias=False,
                    name="layer1_outconv2_0")(h)
        h = nn.BatchNorm(use_running_average=True, name="layer1_outconv2_bn")(h)
        h = nn.leaky_relu(h, 0.01)
        x1_out = nn.Conv(c.block_dims[0], (3, 3), padding=1, use_bias=False,
                         name="layer1_outconv2_1")(h)
        return x3_out, x1_out  # coarse 1/8, fine 1/2


# ----------------------------------------------------------- pos encoding
def sine_pos_encoding(H: int, W: int, d_model: int,
                      temp_bug_fix: bool = True) -> np.ndarray:
    """(H, W, d_model) 2D sine positional encoding
    (position_encoding.py:22-34).  ``temp_bug_fix=False`` reproduces the
    original buggy temperature ``(-log(1e4)/d_model)//2`` (a Python
    floor-division precedence bug the released checkpoints were trained
    with; see position_encoding.py:26-28)."""
    pe = np.zeros((d_model, H, W), dtype=np.float32)
    y_pos = np.cumsum(np.ones((H, W)), axis=0)[None]
    x_pos = np.cumsum(np.ones((H, W)), axis=1)[None]
    if temp_bug_fix:
        temp = -math.log(10000.0) / (d_model // 2)
    else:
        temp = (-math.log(10000.0) / d_model) // 2
    div = np.exp(np.arange(0, d_model // 2, 2) * temp)
    div = div[:, None, None]
    pe[0::4] = np.sin(x_pos * div)
    pe[1::4] = np.cos(x_pos * div)
    pe[2::4] = np.sin(y_pos * div)
    pe[3::4] = np.cos(y_pos * div)
    return np.moveaxis(pe, 0, -1)


# ------------------------------------------------------------ transformer
def linear_attention(q, k, v, eps=1e-6):
    """elu+1 kernelized attention (linear_attention.py:18-50).
    q: (B, L, H, D), k/v: (B, S, H, D)."""
    Q = jax.nn.elu(q) + 1.0
    K = jax.nn.elu(k) + 1.0
    v_len = v.shape[1]
    v = v / v_len
    KV = jnp.einsum("bshd,bshv->bhdv", K, v)
    Z = 1.0 / (jnp.einsum("blhd,bhd->blh", Q, K.sum(axis=1)) + eps)
    out = jnp.einsum("blhd,bhdv,blh->blhv", Q, KV, Z) * v_len
    return out


class LoftrEncoderLayer(nn.Module):
    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, x, source):
        B, L, C = x.shape
        dim = self.d_model // self.nhead
        q = nn.Dense(self.d_model, use_bias=False, name="q_proj")(x)
        k = nn.Dense(self.d_model, use_bias=False, name="k_proj")(source)
        v = nn.Dense(self.d_model, use_bias=False, name="v_proj")(source)
        q = q.reshape(B, -1, self.nhead, dim)
        k = k.reshape(B, -1, self.nhead, dim)
        v = v.reshape(B, -1, self.nhead, dim)
        msg = linear_attention(q, k, v).reshape(B, L, C)
        msg = nn.Dense(self.d_model, use_bias=False, name="merge")(msg)
        msg = nn.LayerNorm(epsilon=1e-5, name="norm1")(msg)  # torch eps
        h = jnp.concatenate([x, msg], axis=-1)
        h = nn.Dense(self.d_model * 2, use_bias=False, name="mlp_0")(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, use_bias=False, name="mlp_1")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(h)
        return x + h


class LocalFeatureTransformer(nn.Module):
    d_model: int
    nhead: int
    n_pairs: int
    prefix: str = "layer"

    @nn.compact
    def __call__(self, f0, f1):
        for i in range(self.n_pairs):
            self_l = LoftrEncoderLayer(self.d_model, self.nhead,
                                       name=f"{self.prefix}{2*i}")
            f0 = self_l(f0, f0)
            f1 = self_l(f1, f1)
            cross_l = LoftrEncoderLayer(self.d_model, self.nhead,
                                        name=f"{self.prefix}{2*i+1}")
            # sequential cross update (transformer.py:94-96): feat1 attends
            # to the ALREADY-updated feat0
            f0 = cross_l(f0, f1)
            f1 = cross_l(f1, f0)
        return f0, f1


# --------------------------------------------------- coarse/fine matching
def dual_softmax_conf(f0: jnp.ndarray, f1: jnp.ndarray, temp: float) -> jnp.ndarray:
    """Dual-softmax confidence matrix (coarse_matching.py:109-119):
    features (B, L, C)/(B, S, C) -> (B, L, S)."""
    d = f0.shape[-1]
    f0n = f0 / (d ** 0.5)
    f1n = f1 / (d ** 0.5)
    sim = jnp.einsum("bld,bsd->bls", f0n, f1n) / temp
    return jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)


def coarse_match_fixed(conf: jnp.ndarray, Hc: int, Wc: int, thr: float,
                       border_rm: int, K: int):
    """Fixed-capacity coarse match selection (coarse_matching.py
    get_coarse_match :150-196, eval path): confidence threshold + border
    removal + mutual-nearest, then static top-K by confidence instead of
    boolean indexing (TPU static shapes).

    conf: (B, L, S) with L == S == Hc*Wc.  Returns (i_ids, j_ids, mconf,
    valid), each (B, K).
    """
    best_j = jnp.argmax(conf, axis=2)          # (B, L)
    best_i = jnp.argmax(conf, axis=1)          # (B, S)
    l_idx = jnp.arange(Hc * Wc)
    mutual = jax.vmap(lambda bi, bj: bi[bj] == l_idx)(best_i, best_j)
    conf_best = jnp.max(conf, axis=2)          # (B, L)
    yi = l_idx // Wc
    xi = l_idx % Wc
    rm = border_rm
    inb0 = (yi >= rm) & (yi < Hc - rm) & (xi >= rm) & (xi < Wc - rm)
    yj = best_j // Wc
    xj = best_j % Wc
    inb1 = (yj >= rm) & (yj < Hc - rm) & (xj >= rm) & (xj < Wc - rm)
    ok = mutual & (conf_best > thr) & inb0[None] & inb1

    score = jnp.where(ok, conf_best, -1.0)
    # small inputs (trainer smoke sizes) can have fewer coarse cells than
    # the configured match capacity — clamp, the capacity is an upper bound
    K = min(K, score.shape[1])
    mconf, i_ids = jax.lax.top_k(score, K)     # (B, K)
    j_ids = jnp.take_along_axis(best_j, i_ids, axis=1)
    valid = mconf > 0
    return i_ids, j_ids, jnp.where(valid, mconf, 0.0), valid


def fine_expectation(w0f: jnp.ndarray, w1f: jnp.ndarray, W: int) -> jnp.ndarray:
    """Expectation-over-heatmap fine refinement (fine_matching.py:43-54):
    transformed window features (M, WW, C) x2 -> normalized [-1, 1] sub-cell
    coords (M, 2) [dx, dy] of the match in image 1."""
    WW = W * W
    C = w0f.shape[-1]
    center = w0f[:, WW // 2, :]  # (M, C)
    simf = jnp.einsum("mc,mrc->mr", center, w1f) / (C ** 0.5)
    heat = jax.nn.softmax(simf, axis=1)  # (M, WW)
    ax = jnp.arange(W, dtype=jnp.float32) / (W // 2) - 1.0  # [-1, 1]
    gy, gx = jnp.meshgrid(ax, ax, indexing="ij")
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (WW, 2) [x, y]
    return jnp.einsum("mr,rd->md", heat, grid)  # (M, 2) in [-1, 1]


# ----------------------------------------------------------------- LoFTR
class LoftrModule(nn.Module):
    cfg: LoftrCfg

    @nn.compact
    def __call__(self, img0, img1, gt_ids=None):
        """img0/img1: (B, H, W, 1) grayscale in [0,1].  H, W divisible by 8.

        Inference (gt_ids None) returns dict of fixed-capacity matches (per
        batch item): mkpts0, mkpts1: (B, K, 2) pixel coords; conf: (B, K);
        valid: (B, K).

        Training (gt_ids = (i_ids, j_ids), each (B, K) coarse cell ids)
        teacher-forces the fine branch at the ground-truth coarse cells and
        returns {conf_matrix: (B, L, S), mkpts1_f: (B, K, 2)} for the loss
        (reference LoFTR/src/losses/loftr_loss.py supervision points).
        """
        c = self.cfg
        backbone = ResNetFPN82(c, name="backbone")
        fc0, ff0 = backbone(img0)
        fc1, ff1 = backbone(img1)
        B, Hc, Wc, Dc = fc0.shape
        _, Hf, Wf, Df_in = ff0.shape

        pe = jnp.asarray(sine_pos_encoding(Hc, Wc, c.d_coarse, c.temp_bug_fix))
        f0 = (fc0 + pe[None]).reshape(B, Hc * Wc, Dc)
        f1 = (fc1 + pe[None]).reshape(B, Hc * Wc, Dc)

        f0, f1 = LocalFeatureTransformer(
            c.d_coarse, c.nhead, c.coarse_pairs, name="loftr_coarse"
        )(f0, f1)

        # dual-softmax coarse matching (coarse_matching.py)
        conf = dual_softmax_conf(f0, f1, c.dsmax_temp)

        # ---------------- fine branch (shared by both modes) ----------------
        W = c.window
        stride = Hf // Hc  # 4
        down = nn.Dense(c.d_fine, name="fine_down_proj")
        merge = nn.Dense(c.d_fine, name="fine_merge_feat")
        ft = LocalFeatureTransformer(c.d_fine, c.nhead, c.fine_pairs,
                                     name="loftr_fine")

        # W x W window offsets around a fine-grid center
        offs = jnp.stack(
            jnp.meshgrid(jnp.arange(-(W // 2), W // 2 + 1),
                         jnp.arange(-(W // 2), W // 2 + 1), indexing="ij"),
            axis=-1,
        ).reshape(-1, 2)  # (WW, 2) [dy, dx]
        WW = W * W

        def fine_refine(i_ids, j_ids):
            """Teacher/inference-shared fine head: window gather at coarse
            cells -> fine transformer -> heatmap expectation. Returns the
            sub-cell delta (B, K, 2) in input pixels."""

            def gather_windows(feat_f, ids):
                # feat_f: (Hf, Wf, D), ids: (K,) coarse cell ids
                cy = (ids // Wc) * stride
                cx = (ids % Wc) * stride
                yy = jnp.clip(cy[:, None] + offs[None, :, 0], 0, Hf - 1)
                xx = jnp.clip(cx[:, None] + offs[None, :, 1], 0, Wf - 1)
                return feat_f[yy, xx]  # (K, WW, D)

            w0 = jax.vmap(gather_windows)(ff0, i_ids)  # (B, K, WW, Df)
            w1 = jax.vmap(gather_windows)(ff1, j_ids)
            # coarse context concat (fine_preprocess.py cat_c_feat)
            c0 = jax.vmap(lambda f, i: f[i])(f0, i_ids)  # (B, K, Dc)
            c1 = jax.vmap(lambda f, i: f[i])(f1, j_ids)
            d0 = down(c0)[:, :, None, :]
            d1 = down(c1)[:, :, None, :]
            w0m = merge(jnp.concatenate(
                [w0, jnp.broadcast_to(d0, w0.shape[:3] + (c.d_fine,))], -1))
            w1m = merge(jnp.concatenate(
                [w1, jnp.broadcast_to(d1, w1.shape[:3] + (c.d_fine,))], -1))
            Kn = i_ids.shape[1]
            w0f, w1f = ft(
                w0m.reshape(B * Kn, WW, c.d_fine), w1m.reshape(B * Kn, WW, c.d_fine)
            )
            # expectation over heatmap (fine_matching.py)
            coords = fine_expectation(w0f, w1f, W)  # (BK, 2) in [-1, 1]
            scale_f = 2  # input -> fine
            return coords.reshape(B, Kn, 2) * (W // 2) * scale_f

        def cells_to_px(ids):
            return jnp.stack([(ids % Wc), (ids // Wc)], axis=-1).astype(jnp.float32) * 8

        if gt_ids is not None:
            # training mode: teacher-forced fine windows at GT coarse cells
            i_ids, j_ids = gt_ids
            delta = fine_refine(i_ids, j_ids)
            return {
                "conf_matrix": conf,
                "mkpts0": cells_to_px(i_ids),
                "mkpts1_f": cells_to_px(j_ids) + delta,
            }

        # mutual nearest + threshold, fixed-capacity top-K
        i_ids, j_ids, top_conf, valid = coarse_match_fixed(
            conf, Hc, Wc, c.thr, c.border_rm, c.max_matches
        )

        delta = fine_refine(i_ids, j_ids)
        mk0 = cells_to_px(i_ids)
        mk1_f = cells_to_px(j_ids) + delta

        return {
            "mkpts0": mk0,
            "mkpts1": mk1_f,
            "conf": top_conf,
            "valid": valid,
        }


class LoftrMatcher:
    """Host wrapper with the LoftrRunner.predict contract
    (loftr_wrapper.py:29-82): batched grayscale pairs -> per-pair (K, 5)
    [uA, vA, uB, vB, conf] + validity."""

    def __init__(self, cfg: LoftrCfg = LoftrCfg(), params=None, seed: int = 0):
        self.cfg = cfg
        self.module = LoftrModule(cfg)
        self._apply = jax.jit(
            lambda p, a, b: self.module.apply(p, a, b)
        )
        self.params = params
        self._seed = seed

    def init_params(self, H: int = 400, W: int = 400):
        dummy = jnp.zeros((1, H - H % 8, W - W % 8, 1))
        self.params = self.module.init(jax.random.PRNGKey(self._seed), dummy, dummy)
        return self.params

    def predict(self, rgbAs: np.ndarray, rgbBs: np.ndarray):
        """rgbAs/rgbBs: (B, H, W) grayscale [0,255] or [0,1]."""
        a = np.asarray(rgbAs, dtype=np.float32)
        b = np.asarray(rgbBs, dtype=np.float32)
        if a.max() > 1.5:
            a = a / 255.0
            b = b / 255.0
        H8 = a.shape[1] - a.shape[1] % 8
        W8 = a.shape[2] - a.shape[2] % 8
        a = a[:, :H8, :W8, None]
        b = b[:, :H8, :W8, None]
        if self.params is None:
            self.init_params(H8, W8)
        out = self._apply(self.params, jnp.asarray(a), jnp.asarray(b))
        corres = np.concatenate(
            [np.asarray(out["mkpts0"]), np.asarray(out["mkpts1"]),
             np.asarray(out["conf"])[..., None]], axis=-1,
        )
        return corres, np.asarray(out["valid"])


# ------------------------------------------------------- weight transfer
def convert_torch_state_dict(state_dict: dict, cfg: LoftrCfg = LoftrCfg()):
    """Map a reference LoFTR checkpoint state dict (torch) onto this
    module's flax params.  Handles the 'matcher.' prefix of the released
    ckpts.  Returns {'params': ..., 'batch_stats': ...}."""

    sd = {}
    for k, v in state_dict.items():
        k = k.replace("matcher.", "")
        sd[k] = np.asarray(v)

    params: dict = {}
    stats: dict = {}

    def put(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(val)

    def conv(tpath, fpath):
        if tpath + ".weight" not in sd:
            return
        w = sd[tpath + ".weight"]  # (O, I, kh, kw)
        put(params, fpath + ("kernel",), np.transpose(w, (2, 3, 1, 0)))

    def bn(tpath, fpath):
        if tpath + ".weight" not in sd:
            return
        put(params, fpath + ("scale",), sd[tpath + ".weight"])
        put(params, fpath + ("bias",), sd[tpath + ".bias"])
        put(stats, fpath + ("mean",), sd[tpath + ".running_mean"])
        put(stats, fpath + ("var",), sd[tpath + ".running_var"])

    def dense(tpath, fpath, bias=True):
        if tpath + ".weight" not in sd:
            return
        put(params, fpath + ("kernel",), sd[tpath + ".weight"].T)
        if bias and tpath + ".bias" in sd:
            put(params, fpath + ("bias",), sd[tpath + ".bias"])

    # backbone
    B = ("backbone",)
    conv("backbone.conv1", B + ("conv1",))
    bn("backbone.bn1", B + ("bn1",))
    for li, layer in enumerate(["layer1", "layer2", "layer3"], start=1):
        for bi in range(2):
            base = f"backbone.{layer}.{bi}"
            fb = B + (f"{layer}_{bi}",)
            conv(f"{base}.conv1", fb + ("conv1",))
            conv(f"{base}.conv2", fb + ("conv2",))
            bn(f"{base}.bn1", fb + ("bn1",))
            bn(f"{base}.bn2", fb + ("bn2",))
            if f"{base}.downsample.0.weight" in sd:
                conv(f"{base}.downsample.0", fb + ("down_conv",))
                bn(f"{base}.downsample.1", fb + ("down_bn",))
    conv("backbone.layer3_outconv", B + ("layer3_outconv",))
    conv("backbone.layer2_outconv", B + ("layer2_outconv",))
    conv("backbone.layer2_outconv2.0", B + ("layer2_outconv2_0",))
    bn("backbone.layer2_outconv2.1", B + ("layer2_outconv2_bn",))
    conv("backbone.layer2_outconv2.3", B + ("layer2_outconv2_1",))
    conv("backbone.layer1_outconv", B + ("layer1_outconv",))
    conv("backbone.layer1_outconv2.0", B + ("layer1_outconv2_0",))
    bn("backbone.layer1_outconv2.1", B + ("layer1_outconv2_bn",))
    conv("backbone.layer1_outconv2.3", B + ("layer1_outconv2_1",))

    def enc_layer(tbase, fbase):
        if f"{tbase}.q_proj.weight" not in sd:
            return
        dense(f"{tbase}.q_proj", fbase + ("q_proj",), bias=False)
        dense(f"{tbase}.k_proj", fbase + ("k_proj",), bias=False)
        dense(f"{tbase}.v_proj", fbase + ("v_proj",), bias=False)
        dense(f"{tbase}.merge", fbase + ("merge",), bias=False)
        dense(f"{tbase}.mlp.0", fbase + ("mlp_0",), bias=False)
        dense(f"{tbase}.mlp.2", fbase + ("mlp_1",), bias=False)
        put(params, fbase + ("norm1", "scale"), sd[f"{tbase}.norm1.weight"])
        put(params, fbase + ("norm1", "bias"), sd[f"{tbase}.norm1.bias"])
        put(params, fbase + ("norm2", "scale"), sd[f"{tbase}.norm2.weight"])
        put(params, fbase + ("norm2", "bias"), sd[f"{tbase}.norm2.bias"])

    for i in range(cfg.coarse_pairs * 2):
        enc_layer(f"loftr_coarse.layers.{i}", ("loftr_coarse", f"layer{i}"))
    for i in range(cfg.fine_pairs * 2):
        enc_layer(f"loftr_fine.layers.{i}", ("loftr_fine", f"layer{i}"))
    dense("fine_preprocess.down_proj", ("fine_down_proj",))
    dense("fine_preprocess.merge_feat", ("fine_merge_feat",))

    return {"params": params, "batch_stats": stats}


def load_checkpoint(path: str, cfg: LoftrCfg = LoftrCfg()) -> LoftrMatcher:
    """Build a LoftrMatcher from a weights file.

    Accepts either a torch checkpoint (``.ckpt``/``.pth`` with a
    ``state_dict`` key, the reference outdoor_ds.ckpt format that
    loftr_wrapper.py:24 loads) or an ``.npz`` of already-converted flax
    params (keys = '/'-joined pytree paths, as written by
    ``save_params_npz``)."""
    if path.endswith(".npz"):
        flat = np.load(path)
        tree: dict = {}
        for k in flat.files:
            node = tree
            parts = k.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(flat[k])
        params = tree
    else:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        params = convert_torch_state_dict(
            {k: v.numpy() for k, v in sd.items()}, cfg
        )
    return LoftrMatcher(cfg, params=params)


def save_params_npz(params, path: str):
    """Flatten a converted params pytree to an .npz (fast reload without
    torch)."""
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + (k,))
        else:
            flat["/".join(prefix)] = np.asarray(node)

    walk(params, ())
    np.savez(path, **flat)
