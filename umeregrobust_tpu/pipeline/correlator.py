"""Kernel-correlation hypothesis scoring (the "FeatureCorrelator").

Scores each candidate rigid transform T by a Cauchy-weighted feature
correlation between the transformed source and the target cloud, and picks
the argmax. Functional parity with reference utils/loc_utils.py:579-681
(feature_spatial_var / cauchy_kernel / pc_corr* / FeatureCorrelator) and
evaluate.py:20-47 (pc_fcht):

  m         = mean feature over src+tgt concatenated
  w_p       = mean kNN(50, excl. self) feature-difference norm per point
  f~        = (f - m) * w_p
  score(T)  = sum_i sum_{j in kNN20(T p_i)} cauchy(|T p_i - q_j|, sigma)
              * <f~_i, g~_j>  / N_src

TPU design: one hypothesis at a time under lax.scan (hypothesis count is
the reference's corr-batch loop), source points chunked so the
(chunk x N_tgt) distance matrix stays small; the cross term is an MXU
matmul. An optional two-stage mode scores all hypotheses on a subsampled
source first and rescores only the top few exactly — a TPU-side redesign
that preserves the argmax with overwhelming probability at ~10x less work.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from umeregrobust_tpu.ops.neighbors import gather_padded, knn, pairwise_sqdist

__all__ = [
    "cauchy_kernel",
    "feature_spatial_var",
    "prepare_weighted_features",
    "correlator_scores",
    "correlator_scores_radius",
    "correlator_scores_radius_fused",
    "select_best_transform",
]


def cauchy_kernel(e: jnp.ndarray, k: float = 0.1) -> jnp.ndarray:
    """1 / (1 + (e/k)^2) (reference utils/loc_utils.py:588-589)."""
    return 1.0 / (1.0 + (e / k) ** 2)


def feature_spatial_var(
    pts: jnp.ndarray,
    feat: jnp.ndarray,
    mask: jnp.ndarray,
    k: int = 50,
    approx: bool = False,
    anchors: Optional[int] = None,
) -> jnp.ndarray:
    """Mean feature-difference norm over the k-1 nearest neighbors
    (self excluded), reference utils/loc_utils.py:579-585 with knn=50.

    approx=True uses the TPU approximate top-k for the neighbor search —
    the weight is a statistical smoothness measure, so a ~3% chance of a
    slightly-farther substitute neighbor perturbs it negligibly (measured:
    0 winner flips in 200 adversarial near-tie trials, EXPERIMENTS.md E2).

    anchors=M (< N): compute the weight exactly on the first M rows only
    (callers fill clouds in randomized order, so they are a uniform
    anchor subsample) and transfer it to every point by nearest anchor —
    the weight field is spatially smooth by construction (a k-NN MEAN),
    so nearest-anchor interpolation preserves it; the top-k then runs on
    M rows instead of N (the per-pair prepare stage was ~8 ms of top_k at
    bench sizes, trace_e2e). Recall-gated on the hardened bench like
    every fast-path divergence."""
    if anchors is not None and anchors < pts.shape[0]:
        a_pts, a_mask = pts[:anchors], mask[:anchors]
        _, idx = knn(a_pts, pts, K=k, q_mask=a_mask, p_mask=mask,
                     approx=approx)
        nbr_feat = gather_padded(feat, idx[:, 1:])  # (M, k-1, C)
        diff = feat[:anchors, None, :] - nbr_feat
        w_a = jnp.mean(jnp.linalg.norm(diff, axis=-1), axis=-1) * a_mask
        d2 = pairwise_sqdist(pts, a_pts)
        d2 = jnp.where(a_mask[None, :], d2, jnp.float32(1e30))
        return w_a[jnp.argmin(d2, axis=-1)] * mask
    _, idx = knn(pts, pts, K=k, q_mask=mask, p_mask=mask, approx=approx)
    nbr_feat = gather_padded(feat, idx[:, 1:])  # (N, k-1, C), drop self
    diff = feat[:, None, :] - nbr_feat
    return jnp.mean(jnp.linalg.norm(diff, axis=-1), axis=-1) * mask


def prepare_weighted_features(
    src_pts: jnp.ndarray,
    src_feat: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_pts: jnp.ndarray,
    tgt_feat: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    var_knn: int = 50,
    approx_var: bool = False,
    var_anchors: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean-center (joint mean) and spatial-variance-weight both feature
    sets (reference utils/loc_utils.py:660-664)."""
    m_all = jnp.concatenate([src_mask, tgt_mask]).astype(jnp.float32)
    f_all = jnp.concatenate([src_feat, tgt_feat], axis=0)
    m = jnp.sum(f_all * m_all[:, None], axis=0) / jnp.maximum(jnp.sum(m_all), 1.0)
    w_src = feature_spatial_var(src_pts, src_feat, src_mask, k=var_knn,
                                approx=approx_var, anchors=var_anchors)
    w_tgt = feature_spatial_var(tgt_pts, tgt_feat, tgt_mask, k=var_knn,
                                approx=approx_var, anchors=var_anchors)
    fs = (src_feat - m) * w_src[:, None] * src_mask[:, None]
    ft = (tgt_feat - m) * w_tgt[:, None] * tgt_mask[:, None]
    return fs, ft


@partial(jax.jit, static_argnames=("knn_k", "sigma", "chunk", "hyp_chunk"))
def correlator_scores(
    src_pts: jnp.ndarray,
    src_featw: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_pts: jnp.ndarray,
    tgt_featw: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    Ts: jnp.ndarray,
    knn_k: int = 20,
    sigma: float = 1.5,
    chunk: int = 1024,
    hyp_chunk: int = 8,
) -> jnp.ndarray:
    """Exact kNN-capped scores (H,) for each hypothesis T in Ts (H, 4, 4).

    Hypotheses run in vmapped chunks so the per-call top_k amortizes over
    hyp_chunk * chunk rows. Normalization is by the static source capacity,
    matching the reference's division by the full source point count
    (utils/loc_utils.py:614); scores are only compared across hypotheses of
    the same pair so a constant factor is immaterial.
    """
    N = src_pts.shape[0]
    H = Ts.shape[0]
    pad = (-N) % chunk
    sp = jnp.pad(src_pts, ((0, pad), (0, 0)))
    sf = jnp.pad(src_featw, ((0, pad), (0, 0)))
    sm = jnp.pad(src_mask, (0, pad))
    n_chunks = sp.shape[0] // chunk
    hpad = (-H) % hyp_chunk
    Tp = jnp.concatenate(
        [Ts.astype(jnp.float32),
         jnp.tile(jnp.eye(4)[None], (hpad, 1, 1))], axis=0)
    n_h = Tp.shape[0] // hyp_chunk

    tgt_d2_mask = jnp.where(tgt_mask, 0.0, jnp.float32(1e30))

    def score_chunk(T_block):  # (hyp_chunk, 4, 4)
        R = T_block[:, :3, :3]
        t = T_block[:, :3, 3]

        def chunk_step(acc, xs):
            p, f, m = xs
            # (hyp_chunk, chunk, 3) transformed source block
            p_t = jnp.einsum("nj,hij->hni", p, R,
                             precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
            flat = p_t.reshape(-1, 3)
            d2 = pairwise_sqdist(flat, tgt_pts) + tgt_d2_mask[None, :]
            neg_d2, idx = jax.lax.top_k(-d2, knn_k)  # (hc*chunk, K)
            d = jnp.sqrt(jnp.maximum(-neg_d2, 0.0))
            w = cauchy_kernel(d, sigma)
            g = gather_padded(tgt_featw, idx)  # (hc*chunk, K, C)
            val = jnp.einsum("nc,nkc->nk", jnp.tile(f, (hyp_chunk, 1)), g)
            contrib = jnp.sum(
                (w * val).reshape(hyp_chunk, chunk, knn_k)
                * m[None, :, None], axis=(1, 2))
            return acc + contrib, None

        acc, _ = jax.lax.scan(
            chunk_step, jnp.zeros((hyp_chunk,), jnp.float32),
            (sp.reshape(n_chunks, chunk, 3),
             sf.reshape(n_chunks, chunk, -1),
             sm.reshape(n_chunks, chunk)),
        )
        return acc / jnp.float32(N)

    scores = jax.lax.map(score_chunk, Tp.reshape(n_h, hyp_chunk, 4, 4))
    return scores.reshape(-1)[:H]


@partial(jax.jit, static_argnames=("sigma", "radius_factor", "chunk", "hyp_chunk"))
def correlator_scores_radius(
    src_pts: jnp.ndarray,
    src_featw: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_pts: jnp.ndarray,
    tgt_featw: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    Ts: jnp.ndarray,
    sigma: float = 1.5,
    radius_factor: float = 2.0,
    chunk: int = 1024,
    hyp_chunk: int = 8,
) -> jnp.ndarray:
    """Radius-capped kernel-correlation scores — the MXU-native fast path.

    Instead of the reference's kNN-20 cap (which needs a top_k per source
    row), weights every target point within radius_factor * sigma by the
    Cauchy kernel and contracts the weight matrix directly against the
    features:  score = sum_i f_i . (A @ g)_i  with A = cauchy(D) * 1[D <= R].
    Three matmuls per hypothesis block, zero sorts. The Cauchy weight at
    2 sigma is 0.2 and falls quadratically, so truncation error is small;
    the cap semantics differ from the reference only in how many distant
    points contribute their tails (a documented, benchmarked divergence —
    use correlator_scores for exact reference parity). Adversarially
    stress-tested on near-tie hypothesis sets: winners flip only within
    the sub-2-degree GT cluster, never to a wrong basin, and post-ICP
    results are identical (EXPERIMENTS.md E1).
    """
    N = src_pts.shape[0]
    H = Ts.shape[0]
    pad = (-N) % chunk
    sp = jnp.pad(src_pts, ((0, pad), (0, 0)))
    sf = jnp.pad(src_featw, ((0, pad), (0, 0)))
    sm = jnp.pad(src_mask, (0, pad))
    n_chunks = sp.shape[0] // chunk
    hpad = (-H) % hyp_chunk
    Tp = jnp.concatenate(
        [Ts.astype(jnp.float32), jnp.tile(jnp.eye(4)[None], (hpad, 1, 1))],
        axis=0)
    n_h = Tp.shape[0] // hyp_chunk
    r2 = jnp.float32(radius_factor * sigma) ** 2
    g = (tgt_featw * tgt_mask[:, None]).astype(jnp.bfloat16)

    def score_chunk(T_block):
        R = T_block[:, :3, :3]
        t = T_block[:, :3, 3]

        def chunk_step(acc, xs):
            p, f, m = xs
            p_t = jnp.einsum("nj,hij->hni", p, R,
                             precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
            flat = p_t.reshape(-1, 3)
            d2 = pairwise_sqdist(flat, tgt_pts)
            A = jnp.where(d2 <= r2, cauchy_kernel(jnp.sqrt(d2), sigma), 0.0)
            Ag = jnp.matmul(A.astype(jnp.bfloat16), g,
                            preferred_element_type=jnp.float32)
            val = jnp.sum(
                jnp.tile(f, (hyp_chunk, 1)) * Ag, axis=-1)  # (hc*chunk,)
            contrib = jnp.sum(val.reshape(hyp_chunk, chunk) * m[None, :], axis=1)
            return acc + contrib, None

        acc, _ = jax.lax.scan(
            chunk_step, jnp.zeros((hyp_chunk,), jnp.float32),
            (sp.reshape(n_chunks, chunk, 3),
             sf.reshape(n_chunks, chunk, -1),
             sm.reshape(n_chunks, chunk)),
        )
        return acc / jnp.float32(N)

    scores = jax.lax.map(score_chunk, Tp.reshape(n_h, hyp_chunk, 4, 4))
    return scores.reshape(-1)[:H]


@partial(jax.jit, static_argnames=("sigma", "radius_factor", "ts", "tt"))
def correlator_scores_radius_fused(
    src_pts: jnp.ndarray,
    src_featw: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_pts: jnp.ndarray,
    tgt_featw: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    Ts: jnp.ndarray,
    sigma: float = 1.5,
    radius_factor: float = 2.0,
    ts: int = 256,
    tt: int = 512,
) -> jnp.ndarray:
    """Radius-capped scores via the fused Pallas kernel (ops/pallas_corr.py)
    — numerically equivalent to `correlator_scores_radius` but with zero
    HBM intermediates (the XLA path round-trips an (S, T) weight matrix per
    hypothesis block and is bandwidth-bound)."""
    from umeregrobust_tpu.ops.pallas_corr import corr_scores_fused

    N = src_pts.shape[0]
    H = Ts.shape[0]
    spad = (-N) % ts
    sp = jnp.pad(src_pts, ((0, spad), (0, 0)))
    sf = jnp.pad(src_featw * src_mask[:, None], ((0, spad), (0, 0)))
    T_n = tgt_pts.shape[0]
    tpad = (-T_n) % tt
    tp = jnp.pad(tgt_pts, ((0, tpad), (0, 0)))
    tf = jnp.pad(tgt_featw * tgt_mask[:, None], ((0, tpad), (0, 0)))

    R = Ts[:, :3, :3].astype(jnp.float32)
    t = Ts[:, :3, 3].astype(jnp.float32)
    pts_t = jnp.einsum("nj,hij->hni", sp, R,
                       precision=jax.lax.Precision.HIGHEST) + t[:, None, :]
    pts_t4 = jnp.concatenate(
        [pts_t, jnp.zeros(pts_t.shape[:2] + (1,), jnp.float32)], axis=-1)
    tp4 = jnp.concatenate([tp, jnp.zeros((tp.shape[0], 1), jnp.float32)],
                          axis=-1)
    scores = corr_scores_fused(pts_t4, sf, tp4, tf, sigma=sigma,
                               radius_factor=radius_factor, ts=ts, tt=tt)
    return scores / jnp.float32(N)


def _score(mode, *a, knn_k=20, sigma=1.5, chunk=1024):
    if mode == "radius":
        if jax.default_backend() == "tpu":
            return correlator_scores_radius_fused(*a, sigma=sigma)
        return correlator_scores_radius(*a, sigma=sigma, chunk=chunk)
    return correlator_scores(*a, knn_k=knn_k, sigma=sigma, chunk=chunk)


def select_best_transform(
    src_pts: jnp.ndarray,
    src_feat: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_pts: jnp.ndarray,
    tgt_feat: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    Ts: jnp.ndarray,
    sigma: float,
    knn_k: int = 20,
    var_knn: int = 50,
    coarse_src: Optional[int] = 1024,
    coarse_tgt: Optional[int] = None,
    rescore_top: int = 64,
    key: Optional[jax.Array] = None,
    mode: str = "knn",
    triage_src: Optional[int] = None,
    triage_tgt: Optional[int] = None,
    triage_top: int = 512,
    extra_Ts: Optional[jnp.ndarray] = None,
    prepared: bool = False,
    var_anchors: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full hypothesis test: weight features, score all Ts, return
    (best_T, scores).

    Two-stage when coarse_src is set and smaller than the source size:
    coarse scores on a subsampled source (and, when coarse_tgt is set, a
    subsampled target — the coarse pass only has to land the winner inside
    `rescore_top`) select candidates for exact scoring (coarse_src=None =>
    single-stage, reference parity). mode='knn' is the reference's kNN-20
    cap; mode='radius' is the MXU-native radius-capped variant
    (correlator_scores_radius / the fused Pallas kernel on TPU).

    Optional triage pre-stage (triage_src set, H > triage_top): score ALL
    hypotheses on a tiny subsample (e.g. 256x512 rows — ~1/8 the per-
    hypothesis work of the coarse stage) and keep only the top triage_top
    for the coarse+exact cascade. This pre-stage only has to land the
    winner inside the top triage_top of H — a far looser bar than the
    coarse stage's top-`rescore_top` — so a large hypothesis budget (the
    recall lever on low-overlap pairs) costs ~the triage pass instead of
    a proportional coarse pass.

    extra_Ts ((V, 4, 4), optional): out-of-band candidates (e.g. the
    consensus-refit modes, pipeline/consensus.py) scored at EXACT
    resolution alongside the cascade's finalists — they bypass triage and
    the coarse stage, so a candidate the cheap stages would misrank still
    reaches the arbiter. The returned `scores` stay indexed by Ts rows
    (extras only influence best_T).

    prepared=True: src_feat/tgt_feat already ARE the weighted features
    (prepare_weighted_features output) — callers that also score out of
    band (the consensus arbiter, pipeline/registration.py) prepare once
    and share.
    """
    # the fast path pairs the radius cap with approximate var-knn weights;
    # mode='knn' keeps both reference-exact
    if prepared:
        fs, ft = src_feat, tgt_feat
    else:
        fs, ft = prepare_weighted_features(
            src_pts, src_feat, src_mask, tgt_pts, tgt_feat, tgt_mask,
            var_knn=var_knn, approx_var=(mode == "radius"),
            var_anchors=(var_anchors if mode == "radius" else None))
    H = Ts.shape[0]
    full_idx = None  # maps working hypotheses back to rows of Ts
    if (triage_src is not None and triage_src < src_pts.shape[0]
            and H > triage_top):
        if key is None:
            key = jax.random.PRNGKey(0)
        key, k_ts, k_tt = jax.random.split(key, 3)
        ssel = jax.random.choice(k_ts, src_pts.shape[0], (triage_src,),
                                 replace=False)
        ttp, ttf, ttm = tgt_pts, ft, tgt_mask
        if triage_tgt is not None and triage_tgt < tgt_pts.shape[0]:
            tsel = jax.random.choice(k_tt, tgt_pts.shape[0], (triage_tgt,),
                                     replace=False)
            ttp, ttf, ttm = tgt_pts[tsel], ft[tsel], tgt_mask[tsel]
        tri = _score(mode, src_pts[ssel], fs[ssel], src_mask[ssel],
                     ttp, ttf, ttm, Ts,
                     knn_k=knn_k, sigma=sigma, chunk=min(1024, triage_src))
        _, full_idx = jax.lax.top_k(tri, triage_top)
        Ts = Ts[full_idx]
    if coarse_src is not None and coarse_src < src_pts.shape[0] and H > rescore_top:
        if key is None:
            key = jax.random.PRNGKey(0)
        k_src, k_tgt = jax.random.split(key)
        sel = jax.random.choice(k_src, src_pts.shape[0], (coarse_src,), replace=False)
        ctp, ctf, ctm = tgt_pts, ft, tgt_mask
        if coarse_tgt is not None and coarse_tgt < tgt_pts.shape[0]:
            tsel = jax.random.choice(k_tgt, tgt_pts.shape[0], (coarse_tgt,),
                                     replace=False)
            ctp, ctf, ctm = tgt_pts[tsel], ft[tsel], tgt_mask[tsel]
        coarse = _score(
            mode, src_pts[sel], fs[sel], src_mask[sel], ctp, ctf, ctm,
            Ts, knn_k=knn_k, sigma=sigma, chunk=min(1024, coarse_src))
        _, top_idx = jax.lax.top_k(coarse, rescore_top)
        Ts_top = Ts[top_idx]
        if extra_Ts is not None:
            Ts_top = jnp.concatenate([Ts_top, extra_Ts], axis=0)
        fine = _score(mode, src_pts, fs, src_mask, tgt_pts, ft, tgt_mask,
                      Ts_top, knn_k=knn_k, sigma=sigma)
        best = jnp.argmax(fine)
        out_idx = top_idx if full_idx is None else full_idx[top_idx]
        scores = jnp.full((H,), -jnp.inf).at[out_idx].set(
            fine[: top_idx.shape[0]])
        return Ts_top[best], scores
    n_main = Ts.shape[0]
    Ts_all = (jnp.concatenate([Ts, extra_Ts], axis=0)
              if extra_Ts is not None else Ts)
    scores_all = _score(mode, src_pts, fs, src_mask, tgt_pts, ft, tgt_mask,
                        Ts_all, knn_k=knn_k, sigma=sigma)
    best_T = Ts_all[jnp.argmax(scores_all)]
    scores = scores_all[:n_main]
    if full_idx is not None:
        scores = jnp.full((H,), -jnp.inf).at[full_idx].set(scores)
    return best_T, scores
