"""Training harness for the LoFTR-class matcher.

The reference vendors a full PyTorch-Lightning + DDP trainer for LoFTR
(BundleTrack/LoFTR/train.py, src/lightning/*, src/losses/loftr_loss.py,
src/datasets/* — SURVEY.md §2.4) which is *not* exercised at BundleSDF
runtime (a pretrained checkpoint is loaded instead).  This module is the
TPU-native equivalent:

* supervision  — homography-warped image pairs generated on the fly (the
  standard detector-free-matcher self-supervision; replaces the
  ScanNet/MegaDepth depth-pose supervision which needs those datasets on
  disk).  GT coarse assignment = warp each 1/8-grid cell center of img0
  into img1; GT fine offset = sub-cell residual at the 1/2 grid.
* losses       — focal loss on the dual-softmax confidence matrix
  (reference loftr_loss.py compute_coarse_loss: alpha 0.25, gamma 2,
  pos/neg terms) + l2 fine offset loss (compute_fine_loss).
* distribution — data-parallel over a ``jax.sharding.Mesh`` via
  NamedSharding on the batch axis (replaces the Lightning DDP plugin +
  detectron2 comm helpers); XLA inserts the gradient all-reduce.

Run ``python -m bundlesdf_tpu.models.loftr_train`` for a smoke train.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .loftr_jax import LoftrCfg, LoftrModule


# ----------------------------------------------------------------- data
def random_texture(key, H, W):
    """Multi-scale random texture with enough structure to match."""
    k1, k2, k3 = jax.random.split(key, 3)
    img = jnp.zeros((H, W))
    for k, s in zip((k1, k2, k3), (8, 4, 2)):
        low = jax.random.uniform(k, (H // s, W // s))
        img = img + jax.image.resize(low, (H, W), "linear")
    img = img - img.min()
    return img / (img.max() + 1e-8)


def random_dots_texture(key, H, W, n_dots: int = 96):
    """Random bright/dark discs on a mid-grey shaded base — the texture
    family of the synthetic fixtures (tests/synthetic_{cube,hard}.py dot
    textures) and of speckle-textured real objects.  Pure JAX so the batch
    generator stays jittable."""
    kc, kr, kv, kb = jax.random.split(key, 4)
    centers = jax.random.uniform(kc, (n_dots, 2), minval=0.0,
                                 maxval=1.0) * jnp.array([H - 1.0, W - 1.0])
    radii = jax.random.uniform(kr, (n_dots,), minval=2.0, maxval=6.0)
    vals = jax.random.uniform(kv, (n_dots,), minval=-0.5, maxval=0.5)
    ys = jnp.arange(H, dtype=jnp.float32)[:, None, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :, None]
    d2 = (ys - centers[:, 0]) ** 2 + (xs - centers[:, 1]) ** 2
    disc = jax.nn.sigmoid((radii ** 2 - d2) / (radii + 1.0))  # soft edge
    img = 0.5 + jnp.sum(disc * vals, axis=-1)
    # mild low-frequency shading so brightness constancy isn't trivial
    shade = jax.image.resize(jax.random.uniform(kb, (4, 4)), (H, W), "linear")
    img = img * (0.7 + 0.6 * shade)
    img = img - img.min()
    return img / (img.max() + 1e-8)


def mixed_texture(key, H, W):
    """50/50 smooth-multiscale vs dots (select is jit-friendly)."""
    ksel, ka, kb = jax.random.split(key, 3)
    a = random_texture(ka, H, W)
    b = random_dots_texture(kb, H, W)
    return jnp.where(jax.random.uniform(ksel) < 0.5, a, b)


def random_object_mask(key, H, W):
    """Soft random ellipse ~ the object silhouette: the production matcher
    always sees masked object crops on black background
    (process_image_pair warps fg-masked grays, tracking/corres.py:60-97),
    so the curriculum must include texture islands with hard black
    surrounds."""
    kc, kr, ka = jax.random.split(key, 3)
    cy, cx = jax.random.uniform(kc, (2,), minval=0.38, maxval=0.62)
    ry, rx = jax.random.uniform(kr, (2,), minval=0.22, maxval=0.42)
    ang = jax.random.uniform(ka, (), minval=0.0, maxval=np.pi)
    ys = (jnp.arange(H, dtype=jnp.float32)[:, None] / H) - cy
    xs = (jnp.arange(W, dtype=jnp.float32)[None, :] / W) - cx
    c, s = jnp.cos(ang), jnp.sin(ang)
    u = (c * xs - s * ys) / rx
    v = (s * xs + c * ys) / ry
    d = u * u + v * v
    return jax.nn.sigmoid((1.0 - d) * 40.0)  # ~2px soft edge


def random_homography(key, H, W, max_angle=0.3, max_scale=0.15, max_trans=0.12,
                      max_persp=1e-4):
    """Random similarity + mild perspective about the image center."""
    ka, ks, kt, kp = jax.random.split(key, 4)
    ang = jax.random.uniform(ka, (), minval=-max_angle, maxval=max_angle)
    sc = 1.0 + jax.random.uniform(ks, (), minval=-max_scale, maxval=max_scale)
    tx, ty = jax.random.uniform(kt, (2,), minval=-max_trans, maxval=max_trans)
    px, py = jax.random.uniform(kp, (2,), minval=-max_persp, maxval=max_persp)
    c, s = jnp.cos(ang) * sc, jnp.sin(ang) * sc
    cx, cy = W / 2.0, H / 2.0
    # center -> rotate/scale/translate -> uncenter
    T1 = jnp.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1.0]])
    R = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    R = R.at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)
    R = R.at[0, 2].set(tx * W).at[1, 2].set(ty * H)
    R = R.at[2, 0].set(px).at[2, 1].set(py)
    T2 = jnp.array([[1, 0, cx], [0, 1, cy], [0, 0, 1.0]])
    return T2 @ R @ T1


def warp_image(img, H_mat):
    """Inverse-warp ``img`` (H, W) by homography ``H_mat`` (maps img0 px ->
    img1 px): img1(x) = img0(H^-1 x), bilinear."""
    H, W = img.shape
    Hinv = jnp.linalg.inv(H_mat)
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(xs)
    src = jnp.einsum("ij,jhw->ihw", Hinv, jnp.stack([xs, ys, ones]))
    sx, sy = src[0] / src[2], src[1] / src[2]
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    fx, fy = sx - x0, sy - y0

    def at(yy, xx):
        inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        v = img[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
        return jnp.where(inb, v, 0.0)

    out = (at(y0, x0) * (1 - fx) * (1 - fy) + at(y0, x0 + 1) * fx * (1 - fy)
           + at(y0 + 1, x0) * (1 - fx) * fy + at(y0 + 1, x0 + 1) * fx * fy)
    return out


class HomographyBatch(NamedTuple):
    img0: jnp.ndarray     # (B, H, W, 1)
    img1: jnp.ndarray     # (B, H, W, 1)
    i_ids: jnp.ndarray    # (B, K) GT coarse cells in img0
    j_ids: jnp.ndarray    # (B, K) GT coarse cells in img1
    pts1: jnp.ndarray     # (B, K, 2) exact warped px of cell centers
    pos_mask: jnp.ndarray  # (B, K) valid GT correspondences


def make_batch(key, batch: int, H: int, W: int, max_gt: int) -> HomographyBatch:
    """Generate a homography-supervised pair batch (replaces the reference
    MultiSceneDataModule for this self-supervised regime)."""
    Hc, Wc = H // 8, W // 8

    def one(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        img0 = mixed_texture(k1, H, W)
        # Object-silhouette regime (70%): texture island on black, like the
        # production masked crops; mask applied BEFORE warping so the two
        # views stay geometrically consistent.
        km, ke = jax.random.split(k5)
        msk = random_object_mask(ke, H, W)
        use_mask = jax.random.uniform(km) < 0.7
        msk = jnp.where(use_mask, msk, jnp.ones_like(msk))
        img0 = img0 * msk
        Hm = random_homography(k2, H, W)
        img1 = warp_image(img0, Hm)
        # photometric jitter on the warped view (brightness/contrast/noise)
        # so the matcher cannot rely on raw intensity equality — the
        # reference's supervision pairs come from different real exposures
        kb, kc, kn = jax.random.split(k3, 3)
        gain = jax.random.uniform(kb, (), minval=0.7, maxval=1.3)
        bias = jax.random.uniform(kc, (), minval=-0.15, maxval=0.15)
        img1 = jnp.clip(img1 * gain + bias, 0.0, 1.0)
        img1 = jnp.clip(
            img1 + 0.02 * jax.random.normal(kn, img1.shape), 0.0, 1.0)
        img0 = jnp.clip(
            img0 + 0.02 * jax.random.normal(k4, img0.shape), 0.0, 1.0)
        # GT: coarse cell centers of img0 -> img1
        ys, xs = jnp.meshgrid(jnp.arange(Hc), jnp.arange(Wc), indexing="ij")
        cx = xs.reshape(-1) * 8 + 4.0
        cy = ys.reshape(-1) * 8 + 4.0
        p = jnp.einsum("ij,jn->in", Hm, jnp.stack([cx, cy, jnp.ones_like(cx)]))
        px, py = p[0] / p[2], p[1] / p[2]
        tgt_x, tgt_y = px / 8.0, py / 8.0
        jx = jnp.clip(jnp.floor(tgt_x).astype(jnp.int32), 0, Wc - 1)
        jy = jnp.clip(jnp.floor(tgt_y).astype(jnp.int32), 0, Hc - 1)
        inb = (px >= 4) & (px < W - 4) & (py >= 4) & (py < H - 4)
        # background cells (black-on-black) are not positive supervision
        fg = msk[cy.astype(jnp.int32), cx.astype(jnp.int32)] > 0.5
        inb = inb & fg
        i_ids = jnp.arange(Hc * Wc)
        j_ids = jy * Wc + jx
        # fixed capacity: top max_gt by in-bounds (ties broken by index)
        score = inb.astype(jnp.float32) - jnp.arange(Hc * Wc) * 1e-6
        _, sel = jax.lax.top_k(score, max_gt)
        return (img0[..., None], img1[..., None], i_ids[sel], j_ids[sel],
                jnp.stack([px, py], -1)[sel], inb[sel])

    outs = jax.vmap(one)(jax.random.split(key, batch))
    return HomographyBatch(*outs)


# ----------------------------------------------- depth+pose supervision
def _render_sphere_union(ob_in_cam, K, H, W, spheres, dot_seed=0):
    """Minimal numpy ray tracer of a textured sphere union (the hard-
    fixture object family, tests/synthetic_hard.py render_blob_rgbd) —
    re-implemented here so the package has no test-directory dependency.
    Returns (gray float [0,1], depth z, mask bool)."""
    T_oc = np.linalg.inv(ob_in_cam)
    j, i = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    d_cam = np.stack(
        [(i - K[0, 2]) / K[0, 0], (j - K[1, 2]) / K[1, 1],
         np.ones_like(i, np.float64)], axis=-1)
    d_obj = d_cam @ T_oc[:3, :3].T
    o_obj = T_oc[:3, 3]
    a = np.sum(d_obj * d_obj, axis=-1)
    t_best = np.full((H, W), np.inf)
    sid_best = np.full((H, W), -1, np.int64)
    for s, (cx, cy, cz, r) in enumerate(spheres):
        oc = o_obj - np.array([cx, cy, cz])
        b = 2.0 * (d_obj @ oc)
        c = oc @ oc - r * r
        disc = b * b - 4 * a * c
        ok = disc > 0
        sq = np.sqrt(np.where(ok, disc, 0.0))
        t = (-b - sq) / (2 * a)
        ok &= t > 0.01
        closer = ok & (t < t_best)
        t_best = np.where(closer, t, t_best)
        sid_best = np.where(closer, s, sid_best)
    hit = sid_best >= 0
    t = np.where(hit, t_best, 0.0)
    p_obj = o_obj + d_obj * t[..., None]
    # per-sphere random dot texture, evaluated in OBJECT space so it is
    # view-consistent (the supervision signal needs true photometric
    # correspondence across parallax)
    rng = np.random.default_rng(dot_seed)
    gray = np.full((H, W), 0.45)
    for s, (cx, cy, cz, r) in enumerate(spheres):
        sel = sid_best == s
        if not sel.any():
            continue
        local = (p_obj[sel] - np.array([cx, cy, cz])) / r
        dots = rng.uniform(-1, 1, (24, 3))
        dots /= np.linalg.norm(dots, axis=-1, keepdims=True)
        vals = rng.uniform(-0.45, 0.45, 24)
        d2 = local @ dots.T                     # cos angle to each dot
        w_tex = np.clip((d2 - 0.965) / 0.035, 0, 1)
        gray[sel] = 0.5 + (w_tex * vals).sum(-1)
    # simple lambertian shading from the surface normal (sphere normal)
    n_obj = np.zeros((H, W, 3))
    for s, (cx, cy, cz, r) in enumerate(spheres):
        sel = sid_best == s
        n_obj[sel] = (p_obj[sel] - np.array([cx, cy, cz])) / r
    light = np.array([0.3, -0.5, -0.8])
    light = light / np.linalg.norm(light)
    shade = 0.65 + 0.35 * np.clip(-(n_obj @ light), 0, 1)
    gray = np.clip(gray * shade, 0, 1) * hit
    depth = np.where(hit, t, 0.0).astype(np.float32)
    return gray.astype(np.float32), depth, hit


class DepthViewPool(NamedTuple):
    """Multi-view renders of random objects with exact depth + pose GT."""

    imgs: jnp.ndarray     # (V, H, W) gray [0,1], bg = 0
    depths: jnp.ndarray   # (V, H, W) z, 0 = invalid
    poses: jnp.ndarray    # (V, 4, 4) cam-in-object
    K: jnp.ndarray        # (3, 3)
    views_per: int


def build_depth_view_pool(n_objects=24, views_per=6, H=160, W=160, seed=0,
                          max_rel_deg=28.0):
    """Host-side pool of rendered views for depth+pose-warped supervision
    (VERDICT r4 task #3: replace homography-only supervision).  Objects are
    random sphere unions with view-consistent object-space dot textures —
    the same family as the hard eval fixture; consecutive views differ by
    tracking-scale rotations so GT correspondences carry real parallax and
    self-occlusion."""
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    # long focal so the object fills ~half the frame (the production
    # matcher sees letterboxed object crops, not wide scenes)
    f = 1.6 * H
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float64)
    imgs, depths, poses = [], [], []
    for o in range(n_objects):
        n_sph = rng.integers(2, 6)
        spheres = []
        for _ in range(n_sph):
            c = rng.uniform(-0.05, 0.05, 3)
            r = rng.uniform(0.035, 0.085)
            spheres.append((c[0], c[1], c[2], float(r)))
        base = Rotation.random(random_state=int(rng.integers(1 << 30)))
        for v in range(views_per):
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            # per-view-step rotation at tracking scale; any sampled pair
            # differs by <= views_per * step (~40 deg worst case)
            ang = np.deg2rad(rng.uniform(3.0, max_rel_deg / views_per))
            R = (Rotation.from_rotvec(axis * ang * v) * base).as_matrix()
            ob = np.eye(4)
            ob[:3, :3] = R
            ob[:3, 3] = [rng.uniform(-0.01, 0.01), rng.uniform(-0.01, 0.01),
                         rng.uniform(0.38, 0.5)]
            g, d, _m = _render_sphere_union(ob, K, H, W, spheres, dot_seed=o)
            imgs.append(g)
            depths.append(d)
            poses.append(np.linalg.inv(ob))     # cam-in-object
    return DepthViewPool(
        jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(depths)),
        jnp.asarray(np.stack(poses).astype(np.float32)),
        jnp.asarray(K.astype(np.float32)), views_per)


def make_depth_batch(key, pool: DepthViewPool, batch: int, H: int, W: int,
                     max_gt: int) -> HomographyBatch:
    """Depth+pose-supervised pair batch: GT coarse/fine correspondences by
    back-projecting view-0 cell centers through the exact depth map and
    relative pose, with a z-test against view-1's depth for occlusion —
    the reference's ScanNet/MegaDepth supervision regime
    (LoFTR/src/datasets, spvs_coarse/spvs_fine) on synthetic RGBD."""
    Hc, Wc = H // 8, W // 8
    V = pool.imgs.shape[0]
    n_obj = V // pool.views_per

    def one(k):
        ko, kv, kj, kn0, kn1 = jax.random.split(k, 5)
        o = jax.random.randint(ko, (), 0, n_obj)
        ab = jax.random.choice(kv, pool.views_per, (2,), replace=False)
        v0 = o * pool.views_per + ab[0]
        v1 = o * pool.views_per + ab[1]
        img0 = pool.imgs[v0]
        img1 = pool.imgs[v1]
        d0 = pool.depths[v0]
        d1 = pool.depths[v1]
        rel = jnp.linalg.inv(pool.poses[v1]) @ pool.poses[v0]  # cam0 -> cam1
        # photometric jitter (different exposures)
        kb, kc = jax.random.split(kj)
        gain = jax.random.uniform(kb, (), minval=0.75, maxval=1.25)
        bias = jax.random.uniform(kc, (), minval=-0.1, maxval=0.1)
        msk1 = img1 > 0
        img1 = jnp.where(msk1, jnp.clip(img1 * gain + bias, 0.0, 1.0), 0.0)
        img0 = jnp.clip(img0 + 0.02 * jax.random.normal(kn0, img0.shape), 0, 1)
        img1 = jnp.clip(img1 + 0.02 * jax.random.normal(kn1, img1.shape), 0, 1)

        ys, xs = jnp.meshgrid(jnp.arange(Hc), jnp.arange(Wc), indexing="ij")
        cx = xs.reshape(-1) * 8 + 4.0
        cy = ys.reshape(-1) * 8 + 4.0
        cxi = cx.astype(jnp.int32)
        cyi = cy.astype(jnp.int32)
        z0 = d0[cyi, cxi]
        Km = pool.K
        X0 = jnp.stack([(cx - Km[0, 2]) / Km[0, 0] * z0,
                        (cy - Km[1, 2]) / Km[1, 1] * z0, z0], -1)
        X1 = X0 @ rel[:3, :3].T + rel[:3, 3]
        z1 = X1[:, 2]
        px = Km[0, 0] * X1[:, 0] / jnp.maximum(z1, 1e-6) + Km[0, 2]
        py = Km[1, 1] * X1[:, 1] / jnp.maximum(z1, 1e-6) + Km[1, 2]
        inb = (px >= 4) & (px < W - 4) & (py >= 4) & (py < H - 4) & (z0 > 0.01)
        pxi = jnp.clip(jnp.round(px).astype(jnp.int32), 0, W - 1)
        pyi = jnp.clip(jnp.round(py).astype(jnp.int32), 0, H - 1)
        # z-test: the warped point must BE view-1's front surface
        visible = jnp.abs(d1[pyi, pxi] - z1) < 0.004
        pos = inb & visible
        tgt_x = jnp.clip(jnp.floor(px / 8.0).astype(jnp.int32), 0, Wc - 1)
        tgt_y = jnp.clip(jnp.floor(py / 8.0).astype(jnp.int32), 0, Hc - 1)
        i_ids = jnp.arange(Hc * Wc)
        j_ids = tgt_y * Wc + tgt_x
        score = pos.astype(jnp.float32) - jnp.arange(Hc * Wc) * 1e-6
        _, sel = jax.lax.top_k(score, max_gt)
        return (img0[..., None], img1[..., None], i_ids[sel], j_ids[sel],
                jnp.stack([px, py], -1)[sel], pos[sel])

    outs = jax.vmap(one)(jax.random.split(key, batch))
    return HomographyBatch(*outs)


# ---------------------------------------------------------------- losses
def coarse_focal_loss(conf, i_ids, j_ids, pos_mask, alpha=0.25, gamma=2.0):
    """Focal loss on the dual-softmax confidence matrix (reference
    loftr_loss.py compute_coarse_loss, focal variant): -alpha*(1-p)^gamma
    log(p) at GT-positive cells, -alpha*p^gamma log(1-p) elsewhere."""
    B, L, S = conf.shape
    conf = jnp.clip(conf, 1e-6, 1 - 1e-6)
    gt = jnp.zeros((B, L, S), bool)
    bb = jnp.arange(B)[:, None].repeat(i_ids.shape[1], 1)
    gt = gt.at[bb, i_ids, j_ids].set(pos_mask)
    pos = -alpha * (1 - conf) ** gamma * jnp.log(conf)
    neg = -alpha * conf ** gamma * jnp.log(1 - conf)
    n_pos = gt.sum() + 1e-6
    return (jnp.where(gt, pos, 0.0).sum() / n_pos
            + jnp.where(gt, 0.0, neg).sum() / (B * L * S - gt.sum() + 1e-6))


def fine_l2_loss(mkpts1_f, pts1_gt, pos_mask):
    """L2 on the fine-refined match position, in fine-scale (1/2 px) units
    (reference compute_fine_loss l2 variant)."""
    err = ((mkpts1_f - pts1_gt) / 2.0) ** 2
    w = pos_mask.astype(jnp.float32)
    return (err.sum(-1) * w).sum() / (w.sum() + 1e-6)


# ------------------------------------------------------------- train step
class TrainCfg(NamedTuple):
    H: int = 160
    W: int = 160
    batch: int = 8
    max_gt: int = 256
    lr: float = 1e-3
    warmup: int = 50
    fine_weight: float = 1.0


def make_train_step(module: LoftrModule, tcfg: TrainCfg, optimizer,
                    mesh: Mesh | None = None):
    """Returns a jitted data-parallel (params, opt_state, key, step) ->
    (params, opt_state, metrics) step.  With a mesh, batch inputs are
    sharded over the 'dp' axis; XLA all-reduces the grads (the reference's
    Lightning DDP equivalent)."""

    def loss_fn(params, batch: HomographyBatch):
        out = module.apply(params, batch.img0, batch.img1,
                           gt_ids=(batch.i_ids, batch.j_ids))
        lc = coarse_focal_loss(out["conf_matrix"], batch.i_ids, batch.j_ids,
                               batch.pos_mask)
        lf = fine_l2_loss(out["mkpts1_f"], batch.pts1, batch.pos_mask)
        return lc + tcfg.fine_weight * lf, {"coarse": lc, "fine": lf}

    def step_fn(params, opt_state, key, step, batch=None):
        if batch is None:
            batch = make_batch(key, tcfg.batch, tcfg.H, tcfg.W, tcfg.max_gt)
        if mesh is not None:
            shard = NamedSharding(mesh, P("dp"))
            batch = HomographyBatch(*(jax.lax.with_sharding_constraint(x, shard)
                                      for x in batch))
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, **aux}

    return jax.jit(step_fn, donate_argnums=(0, 1))


def train_loftr(cfg: LoftrCfg | None = None, tcfg: TrainCfg = TrainCfg(),
                n_steps: int = 200, seed: int = 0, mesh: Mesh | None = None,
                log_every: int = 20, save_path: str = "",
                save_every: int = 2000, resume: str = "",
                depth_frac: float = 0.0, depth_pool_objects: int = 24):
    """Train from scratch; returns (params, history). The trained params
    plug straight into ``LoftrMatcher(cfg, params=params)`` — the training
    module shares every submodule name with the inference module.  With
    ``save_path`` the params are periodically flushed as an .npz that
    loftr_jax.load_checkpoint consumes directly.  ``resume`` warm-starts
    from such an .npz (fresh optimizer state — this is a curriculum
    restart, not a bitwise resume; the NOF checkpoint path is the bitwise
    one).  ``depth_frac`` > 0 mixes in that fraction of depth+pose-warped
    supervision batches (make_depth_batch; VERDICT r4 task #3)."""
    cfg = cfg or LoftrCfg()
    module = LoftrModule(cfg)
    key = jax.random.PRNGKey(seed)
    kinit, key = jax.random.split(key)
    if resume:
        from .loftr_jax import load_checkpoint

        params = load_checkpoint(resume, cfg).params
        print(f"resumed params from {resume}", flush=True)
    else:
        params = module.init(kinit, jnp.zeros((1, tcfg.H, tcfg.W, 1)),
                             jnp.zeros((1, tcfg.H, tcfg.W, 1)))
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.warmup_cosine_decay_schedule(
            0.0, tcfg.lr, tcfg.warmup, max(n_steps, tcfg.warmup + 1))),
    )
    opt_state = optimizer.init(params)
    step = make_train_step(module, tcfg, optimizer, mesh)
    hist = []

    pool = None
    gen_depth = None
    if depth_frac > 0:
        print(f"building depth-view pool ({depth_pool_objects} objects)...",
              flush=True)
        pool = build_depth_view_pool(
            n_objects=depth_pool_objects, H=tcfg.H, W=tcfg.W, seed=seed + 1)
        gen_depth = jax.jit(partial(
            make_depth_batch, pool=pool, batch=tcfg.batch, H=tcfg.H,
            W=tcfg.W, max_gt=tcfg.max_gt))

    def _save(params):
        if not save_path:
            return
        from .loftr_jax import save_params_npz

        save_params_npz(params, save_path)

    for i in range(n_steps):
        key, k = jax.random.split(key)
        batch = None
        if gen_depth is not None and (i % 100) < int(depth_frac * 100):
            batch = gen_depth(k)
        params, opt_state, metrics = step(params, opt_state, k, i, batch)
        if i % log_every == 0 or i == n_steps - 1:
            m = {k2: float(v) for k2, v in metrics.items()}
            hist.append({"step": i, **m})
            print(f"step {i}: {m}", flush=True)
        if save_every and (i + 1) % save_every == 0:
            _save(params)
    _save(params)
    return params, hist


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=160,
                    help="train pair resolution (engine crops run at "
                         "feature_corres.resize; closer = better transfer)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="")
    ap.add_argument("--save_every", type=int, default=2000)
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--resume", default="",
                    help=".npz checkpoint to warm-start from")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--depth_frac", type=float, default=0.0,
                    help="fraction of depth+pose-warped supervision batches")
    ap.add_argument("--pool_objects", type=int, default=24)
    args = ap.parse_args()
    train_loftr(
        tcfg=TrainCfg(H=args.size, W=args.size, batch=args.batch, lr=args.lr,
                      warmup=max(50, args.steps // 20)),
        n_steps=args.steps, log_every=args.log_every,
        save_path=args.out, save_every=args.save_every, resume=args.resume,
        seed=args.seed, depth_frac=args.depth_frac,
        depth_pool_objects=args.pool_objects,
    )
