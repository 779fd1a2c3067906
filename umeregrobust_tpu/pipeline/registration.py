"""End-to-end per-pair registration: the flagship pipeline.

Mirrors the reference eval flow (evaluate.py:175-301) as jittable stages
over fixed-size padded inputs:

  1. sample keypoints uniformly from each (SEM-voxelized) cloud
     (evaluate.py:195-204),
  2. fused UME moment matrices around them (my_ume_generation,
     evaluate.py:50-60, normalized),
  3. streaming argmin subspace-distance matching (evaluate.py:214-225),
  4. probabilistic match filter ~ exp((1-d)/tau) (evaluate.py:233-245),
  5. one closed-form transform hypothesis per match (evaluate.py:247-257),
  6. kernel-correlation hypothesis selection on the raw clouds, with
     network features copied to raw points by 1-NN (evaluate.py:259-296),
  7. point-to-point ICP refinement (refine_registration, evaluate.py:63-109).

Everything from step 1 to 6 runs in a single jit per pair; ICP is a second
jit (different point capacities).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from umeregrobust_tpu.core.ume import estimate_rigid_from_ume
from umeregrobust_tpu.ops.neighbors import knn
from umeregrobust_tpu.pipeline.correlator import (
    prepare_weighted_features, select_best_transform)
from umeregrobust_tpu.pipeline.icp import icp_point_to_point  # noqa: F401  (re-exported for callers)
from umeregrobust_tpu.pipeline.matching import argmin_match, probabilistic_match_filter
from umeregrobust_tpu.pipeline.ume_gen import ume_from_ball_query

__all__ = ["RegistrationConfig", "register_pair_features", "register_pair_hungarian", "copy_features_to_raw"]  # noqa: E501


@dataclass(frozen=True)
class RegistrationConfig:
    """Knobs, defaulted to configs/benchmarks/test_kitti_config.yaml."""

    ume_r_nn: float = 5.0  # ume_r_nn
    ume_max_nn: int = 750  # ume_max_nn
    ume_n_samples: int = 2500  # hypotheses kept after the filter
    num_init_keypoints: int = 10000  # evaluate.py:196 when filtering
    filter_by_ume_dist: bool = True
    tau: float = 0.05
    # How the ume_n_samples hypothesis matches are chosen from the
    # num_init_keypoints candidates:
    #   'prob' — iid sampling ~ softmax((1-d)/tau), the reference's filter
    #            (evaluate.py:233-245);
    #   'topk' — the best matches by subspace distance, deterministic;
    #   'mix'  — half top-k + half prob-sampled from the remainder: keeps
    #            the reference's diversity while guaranteeing the highest-
    #            confidence matches are never sampled away (the hardened-
    #            bench lowoverlap failures are exactly such sampling
    #            misses: 4x hypotheses recovers them, BENCH_NOTES_r3).
    filter_mode: str = "prob"
    corr_kernel_sigma: float = 1.5
    corr_knn: int = 20
    corr_var_knn: int = 50
    # fast-path-only (mode='radius'): compute the var-knn weight exactly
    # on this many anchor rows and nearest-anchor-transfer it (the weight
    # field is a k-NN mean, spatially smooth) — the full-cloud top-k was
    # ~8 ms/pair of the prepare stage. None = per-point weights
    # (reference parity; always used in mode='knn').
    corr_var_anchors: Optional[int] = 1024
    corr_coarse_src: Optional[int] = 1024  # None => exact single-stage
    corr_coarse_tgt: Optional[int] = None  # subsample tgt in the coarse pass
    corr_rescore_top: int = 64
    # triage pre-stage: score ALL hypotheses on a tiny (triage_src x
    # triage_tgt) subsample and keep only the best corr_triage_top for the
    # coarse+exact cascade — makes a large ume_n_samples (the low-overlap
    # recall lever, BENCH_NOTES_r3 ablations) cost ~the triage pass
    # instead of a proportional coarse pass. Inert when the hypothesis
    # count is <= corr_triage_top. None => off (reference parity).
    corr_triage_src: Optional[int] = 256
    corr_triage_tgt: Optional[int] = 512
    corr_triage_top: int = 512
    # 'radius' is the MXU-native fast path (~500x faster hypothesis scoring
    # than the kNN-20 cap on TPU); 'knn' reproduces the reference exactly.
    corr_mode: str = "radius"
    # match-consensus rescue (pipeline/consensus.py): vote over the match
    # set, NMS-select consensus_cands distinct SE(3) modes, IRLS-refit each
    # over its voters, mini-ICP-polish them (plus the cascade winner), and
    # arbitrate by STRUCTURE-ONLY exact correlation (ground points are
    # "aligned" under any plane-preserving wrong transform, so only
    # structure discriminates at low overlap). Diagnosed win: verylow-
    # regime pairs where single-match hypotheses are 0.5-1.6 m off and
    # kernel correlation prefers wrong modes that overlay the two scans'
    # dense near-sensor cores (tools/diag_consensus.py: 6/7 failed pairs
    # recovered). 0 = off (reference parity).
    # 16 candidates arbitrate identically to 32 on the hardened suite
    # (BENCH_NOTES_r3 ablation: recall byte-identical, +0.5 pairs/s) —
    # NMS vote modes beyond the top 16 never win the structure arbiter.
    consensus_cands: int = 16
    consensus_tau: float = 2.0
    consensus_nms_rot_deg: float = 15.0
    consensus_nms_trans: float = 5.0
    # polish cost is ~linear in rows x len(radii) x inner (the refit
    # candidates start <= ~1.6 m off, so stage 1 at radius 1.0 pulls them
    # in and one 0.45 m stage snaps near-GT modes to cm — measured
    # equivalent arbitration to the original (1.0, 0.6, 0.35) x 512-row
    # schedule at ~1/3 the device time, tools/profile_polish.py)
    consensus_polish_rows: int = 256
    consensus_polish_radii: Tuple[float, ...] = (1.0, 0.45)
    consensus_polish_inner: int = 4
    consensus_struct_cap: int = 2048
    # adaptive consensus (r5, VERDICT r4 #2a): the rescue stack only wins
    # on pairs whose match support is FRAGMENTED (diag_consensus: winning
    # pairs have single-match hypotheses 0.5-1.6 m off). Gate it on the
    # cascade winner's match-inlier ratio: if >= this fraction of the
    # valid matched keypoint pairs agree with best_T within
    # consensus_gate_radius, the basin is unimodal and the refit/polish/
    # struct-arbiter program is skipped via lax.cond — a real runtime
    # branch in the scan-mode bench (one pair per scan step; under vmap
    # it degrades to select = today's always-on cost, never wrong
    # results). 0 = always run consensus (r4 behavior).
    consensus_gate_inliers: float = 0.0
    consensus_gate_radius: float = 0.6
    # overlap-aware second-round resampling (r5, VERDICT r4 #3 — the
    # untried verylow axis): when the round-1 winner T0's match-inlier
    # ratio is below sr_gate_inliers, predict the co-observed region from
    # T0 (src voxels whose T0-image lands within sr_overlap_radius of an
    # occupied tgt voxel, and vice versa), resample sr_kpts keypoints
    # INSIDE it on both sides, re-match, re-estimate, consensus-refit the
    # new match set, and arbitrate the polished candidates against T0
    # with the same structure-only exact correlation. Targets the E6
    # diagnosis: at 30 m + 150-180 deg the co-observed annulus is thin
    # and the uniform sampler rarely hits it (reference sampling:
    # evaluate.py:195-204). 0 = off.
    sr_kpts: int = 0
    sr_hyps: int = 512
    sr_overlap_radius: float = 2.0
    sr_gate_inliers: float = 0.4
    sr_cands: int = 8
    # Jacobi sweeps of the quaternion Kabsch eigensolver in the 2048-batch
    # hypothesis estimator: 3 deviates <= 0.13 deg from the exact solution
    # (core/ume.estimate_rigid_from_ume docstring) at half the cost.
    estimator_sweeps: int = 3
    icp_max_corr: float = 0.2
    icp_max_iter: int = 200
    # optional coarse-to-fine: a first ICP stage at a larger correspondence
    # radius rescues hypotheses several degrees off (where the reference
    # relies on its hypotheses already being tight). None = single-stage
    # parity with Open3D registration_icp(max_corr).
    icp_coarse_corr: Optional[float] = None
    icp_coarse_iter: int = 25
    # per-(dx,dy)-window candidate budget of the fine ICP grid query; exact
    # while every 3-z-cell window holds <= budget points (ops/densegrid.py
    # max_cell_count). bench.py measures the actual cell occupancy and
    # escalates 8 -> 32 when the exactness condition would be violated.
    icp_budget: int = 8
    # full-resolution polish (reference refine_registration,
    # evaluate.py:63-110, runs ICP on the COMPLETE raw clouds): after the
    # correlator-cloud ICP converges the transform, a short stage on the
    # raw clouds densifies correspondences near the SP threshold. 0 = off
    # (used when no raw clouds are plumbed). Raw clouds are denser per
    # cell, hence the separate budget.
    icp_raw_iter: int = 12
    icp_raw_budget: int = 24
    # multi-resolution schedule: the per-iteration cost is the candidate
    # gather (9 windows x budget rows x #queries — measured ~4 ms/iter at
    # 4096 queries / budget 32 on v5e, the dominant pipeline cost from
    # realistic starts). Most iterations only need a coarse gradient:
    # run them on the first icp_multires source rows (a uniform subsample
    # — callers fill clouds in randomized order) with a small budget,
    # then let the exact full-resolution stage converge in a few
    # iterations (displacement-based exit). 0 = single-stage parity.
    icp_multires: int = 1024
    icp_multires_iter: int = 40
    icp_multires_budget: int = 8
    # source rows of the exact full-resolution stage (0 = all corr rows).
    # The exact stage's job is the final rigid fit; fit noise scales as
    # 1/sqrt(rows), so a few thousand correspondences already sit orders
    # below the 0.1 m SP bar while the per-iteration candidate gather
    # scales linearly with rows (the top stage of the r5 reduced-point
    # trace, PROFILE.md). Rows are a uniform subsample — callers fill
    # clouds in randomized order (same invariant icp_multires relies on).
    icp_exact_rows: int = 0
    # RMS displacement (m) under which an ICP stage's block exit fires
    # (pipeline/icp._icp_loop). The r4 value 1e-4 (0.1 mm) was asserted,
    # not measured; the SP bar is 0.1 m and the iteration accounting
    # (tools/icp_account.py) showed the exact stage spending extra
    # gather blocks converging the last ~micrometers. 1e-3 (1 mm) is
    # adopted r5 after recall-identical A/Bs on BOTH suites at BOTH
    # operating points (BENCH_NOTES_r5 #3).
    icp_disp_exit: float = 1e-3
    # dense-grid box (cells) for the ICP correspondence index; the default
    # covers 77 m at 0.2 m cells — reference-regime scenes (100 m+ span)
    # need a larger box.
    icp_dims: Tuple[int, int, int] = (384, 384, 96)
    # grid-cell multiplier: each ICP stage indexes its cloud at
    # cell = stage_radius * icp_grid_scale over the SAME physical box
    # (icp_dims * icp_max_corr), so the dense table shrinks by scale^3.
    # Query exactness only needs radius <= cell (ops/densegrid
    # build_dense_grid), so any scale >= 1 is exact given a sufficient
    # window budget — the build's full passes over the (C+1,) run table
    # are the dominant grid cost at reference caps (~12-14 ms/pair at
    # 768x768x96; scale 2 cuts the table 8x). bench.py's occupancy
    # pre-check measures worst-window counts at the SCALED cell and
    # escalates budgets accordingly. Measured e2e at the reference
    # point (BENCH_NOTES_r4): scale 2 is NET NEGATIVE (4.45 -> 4.12
    # pairs/s) — the escalated query budget costs more than the
    # smaller build saves. Default stays 1.0; the knob remains for
    # denser clouds where the trade flips.
    icp_grid_scale: float = 1.0
    # candidate-set reuse: each ICP step gathers the 9-window candidates
    # once and runs icp_inner Umeyama updates against the frozen set (the
    # gather is ~10x the cost of a re-rank on v5e; see
    # pipeline/icp._icp_loop). 1 = gather every iteration (exact parity).
    # 6 measured equivalent to 4 on the hardened suite (identical failure
    # set, residual shifts < 0.1 deg) at ~1.5 gathers/pair fewer.
    icp_inner: int = 6
    # 1-NN feature transfer SEM grid -> raw correlator points (reference
    # evaluate.py:272-275 knn_points K=1, unbounded): None = exact brute-
    # force argmin (parity); a radius makes it a dense-grid query — raw
    # points with no SEM point within the radius get a zero feature
    # instead of a far extrapolated one (they then contribute ~nothing to
    # the correlation either way; recall-gated on the hardened bench).
    # The brute-force path round-trips a (chunk x N_sem) distance matrix
    # per chunk — ~3.2 ms/pair of HBM traffic at bench sizes (trace_e2e).
    feat_copy_radius: Optional[float] = None
    feat_copy_budget: int = 16
    feat_copy_dims: Tuple[int, int, int] = (256, 256, 64)
    # structure-biased keypoint sampling: weight a candidate keypoint
    # (1 + boost) if it sits > kp_struct_dz above its 2 m-cell min z (the
    # same label-free criterion as consensus.compact_structure). Ground
    # UME neighborhoods are near-planar and self-similar — at low overlap
    # the correct matches live on shared STRUCTURE, so biasing both
    # clouds' samples toward structure multiplies the chance a true
    # correspondence is sampled on both sides. 0 = uniform (reference
    # evaluate.py:195-204 parity).
    kp_struct_boost: float = 0.0
    kp_struct_dz: float = 0.35


class RegistrationResult(NamedTuple):
    T_init: jnp.ndarray  # (4,4) correlator-selected hypothesis
    T_refined: jnp.ndarray  # (4,4) after ICP
    icp_rmse: jnp.ndarray
    icp_fitness: jnp.ndarray


def _overlap_weight(q_pts, q_mask, k_pts, k_mask, radius, dims):
    """Approximate co-observation mask: True for valid q rows whose cell
    (at cell=radius, box anchored at the k-cloud's min corner) or one of
    its 6 face neighbors holds a valid k point. Used to BIAS second-round
    keypoint sampling (pipeline-level exactness does not depend on it);
    the 7-cell test captures neighbors within ~radius across cell
    boundaries at 7 cheap gathers instead of a true NN query."""
    cell = jnp.float32(radius)
    big = jnp.float32(1e9)
    lo = jnp.min(jnp.where(k_mask[:, None], k_pts, big), axis=0) - cell
    dims_a = jnp.asarray(dims, jnp.int32)
    n_cells = int(np.prod(dims))

    def cell_of(p):
        c = jnp.floor((p - lo[None, :]) / cell).astype(jnp.int32)
        inb = jnp.all((c >= 0) & (c < dims_a[None, :]), axis=-1)
        c = jnp.clip(c, 0, dims_a[None, :] - 1)
        lin = (c[:, 0] * dims[1] + c[:, 1]) * dims[2] + c[:, 2]
        return lin, inb

    k_lin, k_inb = cell_of(k_pts)
    occ = jnp.zeros((n_cells,), bool).at[
        jnp.where(k_mask & k_inb, k_lin, n_cells)].set(True, mode="drop")
    q_lin, q_inb = cell_of(q_pts)
    hit = jnp.zeros(q_pts.shape[0], bool)
    for d in (0, 1, -1, dims[2], -dims[2], dims[1] * dims[2],
              -dims[1] * dims[2]):
        j = jnp.clip(q_lin + d, 0, n_cells - 1)
        hit = hit | occ[j]
    return q_mask & q_inb & hit


def _sample_keypoints(key, pts, mask, n, struct_boost=0.0, struct_dz=0.35):
    """Sample n keypoints ~ uniform over valid rows (reference
    evaluate.py:195-204 samples min(10000, len(pts)); we keep the static
    shape and return a per-keypoint validity flag instead — when the cloud
    has fewer than n valid points, the surplus slots land on padded rows
    and are masked out of matching/filtering downstream).

    struct_boost > 0 multiplies the sampling weight of structure points
    (height above their 2 m-cell min z exceeds struct_dz) by
    (1 + struct_boost) — see RegistrationConfig.kp_struct_boost."""
    p = mask.astype(jnp.float32)
    if struct_boost > 0.0:
        grid_dim = 64
        # size the cell from the data so wide clouds (reference-regime
        # scenes span 100 m+) never clamp outlying points into edge
        # cells and pool min-z across distant regions (ADVICE r3):
        # cell >= 2 m, grown until grid_dim cells cover the x/y span
        big = jnp.float32(1e9)
        lo = jnp.min(jnp.where(mask[:, None], pts[:, :2], big), axis=0)
        hi = jnp.max(jnp.where(mask[:, None], pts[:, :2], -big), axis=0)
        span = jnp.max(hi - lo)
        cell = jnp.maximum(jnp.float32(2.0), span / (grid_dim - 1))
        cc = jnp.floor(pts[:, :2] / cell).astype(jnp.int32)
        cc = cc - jnp.min(jnp.where(mask[:, None], cc, jnp.int32(1 << 20)),
                          axis=0)
        cc = jnp.clip(cc, 0, grid_dim - 1)
        flat = cc[:, 0] * grid_dim + cc[:, 1]
        minz = jnp.full((grid_dim * grid_dim,), jnp.float32(1e9)).at[
            flat].min(jnp.where(mask, pts[:, 2], jnp.float32(1e9)))
        is_struct = mask & (pts[:, 2] - minz[flat] > struct_dz)
        p = p * (1.0 + jnp.float32(struct_boost) * is_struct)
    p = p / jnp.maximum(jnp.sum(p), 1.0)
    idx = jax.random.choice(key, pts.shape[0], (n,), replace=False, p=p)
    return pts[idx], mask[idx]


def copy_features_to_raw(
    raw_pts: jnp.ndarray,
    raw_mask: jnp.ndarray,
    sem_pts: jnp.ndarray,
    sem_feat: jnp.ndarray,
    sem_mask: jnp.ndarray,
    chunk: int = 1024,
) -> jnp.ndarray:
    """1-NN feature transfer from SEM grid points to raw correlator points
    (reference evaluate.py:272-275). Fused Pallas argmin sweep on TPU
    (ops/pallas_nn — zero HBM intermediates); chunked XLA argmin
    elsewhere (the (chunk x N) distance tile round-trips HBM, ~3.2
    ms/pair at bench sizes)."""
    from umeregrobust_tpu.ops.neighbors import pairwise_sqdist

    if jax.default_backend() == "tpu":
        from umeregrobust_tpu.ops.pallas_nn import nn1_argmin

        idx = nn1_argmin(raw_pts, sem_pts, sem_mask)
        return sem_feat[idx] * raw_mask[:, None]

    M = raw_pts.shape[0]
    pad = (-M) % chunk
    qp = jnp.pad(raw_pts, ((0, pad), (0, 0)))
    n_chunks = qp.shape[0] // chunk
    inv = jnp.where(sem_mask, 0.0, jnp.float32(1e30))

    def step(_, qb):
        d2 = pairwise_sqdist(qb, sem_pts) + inv[None, :]
        return None, jnp.argmin(d2, axis=-1).astype(jnp.int32)

    _, idx = jax.lax.scan(step, None, qp.reshape(n_chunks, chunk, 3))
    idx = idx.reshape(-1)[:M]
    return sem_feat[idx] * raw_mask[:, None]


def copy_features_to_raw_grid(
    raw_pts: jnp.ndarray,
    raw_mask: jnp.ndarray,
    sem_pts: jnp.ndarray,
    sem_feat: jnp.ndarray,
    sem_mask: jnp.ndarray,
    radius: float,
    budget: int = 16,
    dims: Tuple[int, int, int] = (256, 256, 64),
) -> jnp.ndarray:
    """Radius-bounded 1-NN feature transfer via the dense grid index.

    Fast-path variant of `copy_features_to_raw` (cfg.feat_copy_radius):
    the SEM cloud is 0.3 m-voxelized, so virtually every raw point has a
    SEM neighbor well inside `radius`; the rare miss gets a zero feature
    (it would have received a >radius extrapolated feature from the exact
    path and contributes ~zero correlation mass either way)."""
    from umeregrobust_tpu.ops.densegrid import build_dense_grid, dense_nn_query

    grid = build_dense_grid(sem_pts, sem_mask, cell=float(radius),
                            dims=tuple(dims))
    _, idx = dense_nn_query(grid, raw_pts, radius=float(radius),
                            q_mask=raw_mask, budget=int(budget))
    ok = idx >= 0
    return sem_feat[jnp.where(ok, idx, 0)] * (ok & raw_mask)[:, None]


def refine_with_icp(
    cfg: RegistrationConfig,
    T: jnp.ndarray,
    corr_src_pts, corr_src_mask, corr_tgt_pts, corr_tgt_mask,
    raw_src_pts=None, raw_src_mask=None,
    raw_tgt_pts=None, raw_tgt_mask=None,
    return_iters: bool = False,
):
    """The full ICP refinement schedule (jittable; shared by every path):

      optional coarse-radius stage (icp_coarse_corr)
      -> multi-resolution stage (icp_multires source rows, small budget)
      -> exact full-resolution correlator-cloud stage
      -> optional raw-cloud polish (reference refine_registration runs on
         the COMPLETE raw clouds, evaluate.py:63-110)

    Per-iteration cost is the candidate gather, proportional to
    #queries x budget; the coarse stages do the long haul cheaply and the
    exact stages converge in a few iterations (displacement-based exit in
    pipeline/icp._icp_loop). Returns (T, rmse, fitness) of the last stage.
    """
    from umeregrobust_tpu.ops.densegrid import build_dense_grid
    from umeregrobust_tpu.pipeline.icp import _icp_loop

    # fixed physical box: icp_dims cells at the fine radius. Every stage
    # covers this box; its cell is stage_radius * icp_grid_scale, its
    # dims shrink to match (all static Python arithmetic at trace time).
    fine = float(cfg.icp_max_corr)
    box = tuple(d * fine for d in cfg.icp_dims)

    def grid_for(radius):
        cell = float(radius) * float(cfg.icp_grid_scale)
        # ceil with a tolerance so box/cell == exact integer stays put
        dims = tuple(int(math.ceil(b / cell - 1e-6)) for b in box)
        return cell, dims

    def grid_arrays(pts, mask, radius):
        cell, dims = grid_for(radius)
        g = build_dense_grid(pts, mask, cell=cell, dims=dims)
        return (g.points, g.points_sorted, g.order, g.runs, g.origin,
                g.overflow, g.wstart), cell, dims

    stages = []
    if cfg.icp_coarse_corr is not None:
        stages.append((grid_arrays(corr_tgt_pts, corr_tgt_mask,
                                   float(cfg.icp_coarse_corr)),
                       float(cfg.icp_coarse_corr), int(cfg.icp_coarse_iter),
                       32, corr_src_pts, corr_src_mask))
    corr_grid = grid_arrays(corr_tgt_pts, corr_tgt_mask,
                            float(cfg.icp_max_corr))
    m = int(cfg.icp_multires)
    if m and m < corr_src_pts.shape[0]:
        stages.append((corr_grid, float(cfg.icp_max_corr),
                       int(cfg.icp_multires_iter),
                       int(cfg.icp_multires_budget),
                       corr_src_pts[:m], corr_src_mask[:m]))
    e = int(cfg.icp_exact_rows)
    if e and e < corr_src_pts.shape[0]:
        exact_sp, exact_smk = corr_src_pts[:e], corr_src_mask[:e]
    else:
        exact_sp, exact_smk = corr_src_pts, corr_src_mask
    stages.append((corr_grid, float(cfg.icp_max_corr), int(cfg.icp_max_iter),
                   int(cfg.icp_budget), exact_sp, exact_smk))
    if raw_src_pts is not None and cfg.icp_raw_iter > 0:
        stages.append((grid_arrays(raw_tgt_pts, raw_tgt_mask,
                                   float(cfg.icp_max_corr)),
                       float(cfg.icp_max_corr), int(cfg.icp_raw_iter),
                       int(cfg.icp_raw_budget), raw_src_pts, raw_src_mask))

    rmse = fit = jnp.float32(0.0)
    stage_iters = []
    for (arrays, cell, dims), corr, iters, budget, sp, smk in stages:
        T, rmse, fit, it = _icp_loop(sp, smk, arrays, T, corr, iters, budget,
                                     dims, inner=int(cfg.icp_inner),
                                     cell=cell,
                                     disp_exit=float(cfg.icp_disp_exit))
        stage_iters.append(it)
    if return_iters:
        # iteration accounting (VERDICT r4 #2b): sub-iterations each stage
        # actually ran before its displacement/criteria exit, in schedule
        # order (coarse?, multires?, exact, raw?) — tools/icp_account.py
        # right-sizes icp_multires_iter/icp_max_iter from this
        return T, rmse, fit, jnp.stack(stage_iters)
    return T, rmse, fit


@partial(
    jax.jit,
    static_argnames=("cfg",),
)
def _hypotheses_and_select(
    cfg: RegistrationConfig,
    key: jax.Array,
    src_pts, src_feat, src_mask,
    tgt_pts, tgt_feat, tgt_mask,
    corr_src_pts, corr_src_feat, corr_src_mask,
    corr_tgt_pts, corr_tgt_feat, corr_tgt_mask,
):
    k_src, k_tgt, k_filt, k_corr = jax.random.split(key, 4)

    n_init = cfg.num_init_keypoints if cfg.filter_by_ume_dist else cfg.ume_n_samples
    src_kp, src_kp_ok = _sample_keypoints(
        k_src, src_pts, src_mask, n_init,
        struct_boost=cfg.kp_struct_boost, struct_dz=cfg.kp_struct_dz)
    tgt_kp, tgt_kp_ok = _sample_keypoints(
        k_tgt, tgt_pts, tgt_mask, n_init,
        struct_boost=cfg.kp_struct_boost, struct_dz=cfg.kp_struct_dz)

    ume_src = ume_from_ball_query(
        src_pts, src_feat, src_kp, radius=cfg.ume_r_nn, max_nn=cfg.ume_max_nn,
        p_mask=src_mask, k_mask=src_kp_ok, normalize=True)
    ume_tgt = ume_from_ball_query(
        tgt_pts, tgt_feat, tgt_kp, radius=cfg.ume_r_nn, max_nn=cfg.ume_max_nn,
        p_mask=tgt_mask, k_mask=tgt_kp_ok, normalize=True)

    # invalid keypoints (surplus slots on small clouds) get distance 1e6 so
    # the exp((1-d)/tau) filter assigns them ~zero probability, and padded
    # targets never win an argmin.
    m, d = argmin_match(ume_src, ume_tgt,
                        src_mask=src_kp_ok, tgt_mask=tgt_kp_ok)

    if cfg.filter_by_ume_dist:
        n = cfg.ume_n_samples
        if cfg.filter_mode == "topk":
            keep = jax.lax.top_k(-d, n)[1].astype(jnp.int32)
        elif cfg.filter_mode == "mix":
            h = n // 2
            keep_top = jax.lax.top_k(-d, h)[1].astype(jnp.int32)
            # exclude the top block from the sampled half (d=1e6 rows get
            # ~zero probability, same mechanism that drops invalid slots)
            d_rest = d.at[keep_top].set(jnp.float32(1e6))
            keep_s = probabilistic_match_filter(k_filt, d_rest, n - h,
                                                cfg.tau)
            keep = jnp.concatenate([keep_top, keep_s])
        else:  # 'prob': reference parity (evaluate.py:233-245)
            keep = probabilistic_match_filter(k_filt, d, n, cfg.tau)
    else:
        # mask-explicit: on clouds smaller than ume_n_samples the surplus
        # keypoint slots carry m = -1; route them to the best valid match
        # (repeat-best, as the Hungarian path does) so invalid keypoints
        # provably never reach estimate_rigid_from_ume.
        valid = src_kp_ok & (m >= 0)
        best = jnp.argmin(jnp.where(valid, d, jnp.float32(jnp.inf))).astype(
            jnp.int32)
        keep = jnp.arange(cfg.ume_n_samples, dtype=jnp.int32)
        keep = jnp.where(valid[keep], keep, best)

    G = ume_src[keep]  # matched source UMEs
    H = ume_tgt[jnp.maximum(m[keep], 0)]  # matched target UMEs
    # reference call order: G=src, H=tgt -> T maps src into tgt
    Ts, _ = estimate_rigid_from_ume(G, H, compute_distance=False,
                                    sweeps=cfg.estimator_sweeps)

    use_cons = cfg.consensus_cands > 0
    if use_cons:
        # prepare once; shared by the cascade and the consensus arbiter
        fs_w, ft_w = prepare_weighted_features(
            corr_src_pts, corr_src_feat, corr_src_mask,
            corr_tgt_pts, corr_tgt_feat, corr_tgt_mask,
            var_knn=cfg.corr_var_knn, approx_var=(cfg.corr_mode == "radius"),
            var_anchors=(cfg.corr_var_anchors
                         if cfg.corr_mode == "radius" else None))
    else:
        fs_w, ft_w = corr_src_feat, corr_tgt_feat

    best_T, scores = select_best_transform(
        corr_src_pts, fs_w, corr_src_mask,
        corr_tgt_pts, ft_w, corr_tgt_mask,
        Ts, sigma=cfg.corr_kernel_sigma, knn_k=cfg.corr_knn,
        var_knn=cfg.corr_var_knn, coarse_src=cfg.corr_coarse_src,
        coarse_tgt=cfg.corr_coarse_tgt,
        rescore_top=cfg.corr_rescore_top, key=k_corr, mode=cfg.corr_mode,
        triage_src=cfg.corr_triage_src, triage_tgt=cfg.corr_triage_tgt,
        triage_top=cfg.corr_triage_top, prepared=use_cons,
        var_anchors=cfg.corr_var_anchors)

    if use_cons:
        from umeregrobust_tpu.pipeline.consensus import (
            compact_structure, consensus_refit, polish_candidates)
        from umeregrobust_tpu.pipeline.correlator import _score

        pair_ok = src_kp_ok[keep] & (d[keep] < jnp.float32(1e5))
        kp_s = src_kp[keep]
        kp_t = tgt_kp[jnp.maximum(m[keep], 0)]

        def run_consensus(best_T):
            cand = consensus_refit(
                Ts, kp_s, kp_t, pair_ok,
                tau=cfg.consensus_tau, n_cand=cfg.consensus_cands,
                nms_rot_deg=cfg.consensus_nms_rot_deg,
                nms_trans=cfg.consensus_nms_trans)
            # the cascade winner competes under the same polish + arbiter
            cand = jnp.concatenate([cand, best_T[None]], axis=0)
            rows = cfg.consensus_polish_rows
            pol = polish_candidates(cand, corr_src_pts[:rows],
                                    corr_src_mask[:rows],
                                    corr_tgt_pts, corr_tgt_mask,
                                    radii=cfg.consensus_polish_radii,
                                    inner=cfg.consensus_polish_inner)
            cap = min(cfg.consensus_struct_cap, corr_src_pts.shape[0])
            sp_c, sf_c, sm_c = compact_structure(
                corr_src_pts, fs_w, corr_src_mask, cap)
            tp_c, tf_c, tm_c = compact_structure(
                corr_tgt_pts, ft_w, corr_tgt_mask,
                min(cfg.consensus_struct_cap, corr_tgt_pts.shape[0]))
            s_struct = _score(cfg.corr_mode, sp_c, sf_c, sm_c,
                              tp_c, tf_c, tm_c, pol, knn_k=cfg.corr_knn,
                              sigma=cfg.corr_kernel_sigma)
            return pol[jnp.argmax(s_struct)]

        if cfg.consensus_gate_inliers > 0.0:
            # adaptive gate (see RegistrationConfig.consensus_gate_inliers):
            # inlier ratio of the cascade winner over the matched keypoint
            # set — fragmented support (low ratio) is exactly the regime
            # where the rescue stack wins (diag_consensus), so only those
            # pairs pay for it.
            mapped = kp_s @ best_T[:3, :3].T + best_T[:3, 3]
            err2 = jnp.sum((mapped - kp_t) ** 2, axis=-1)
            r2 = jnp.float32(cfg.consensus_gate_radius ** 2)
            n_ok = jnp.maximum(jnp.sum(pair_ok.astype(jnp.float32)), 1.0)
            inl = jnp.sum((pair_ok & (err2 < r2)).astype(jnp.float32)) / n_ok
            best_T = jax.lax.cond(
                inl < jnp.float32(cfg.consensus_gate_inliers),
                run_consensus, lambda t: t, best_T)
        else:
            best_T = run_consensus(best_T)

        if cfg.sr_kpts > 0:
            # overlap-aware second round (see RegistrationConfig.sr_kpts):
            # triggered only when the round-1 winner's match support is
            # weak; resamples keypoints inside the T0-predicted
            # co-observed region, re-matches, and arbitrates against T0
            # with the same structure-only correlator.
            k_sr_s, k_sr_t, _ = jax.random.split(
                jax.random.fold_in(key, 1729), 3)
            fine = float(cfg.icp_max_corr)
            box = tuple(dd * fine for dd in cfg.icp_dims)
            r_ov = float(cfg.sr_overlap_radius)
            dims_ov = tuple(int(math.ceil(b / r_ov - 1e-6)) + 2 for b in box)

            def run_second_round(T0):
                R0, t0 = T0[:3, :3], T0[:3, 3]
                src_map = src_pts @ R0.T + t0[None, :]
                w_src = _overlap_weight(src_map, src_mask, tgt_pts, tgt_mask,
                                        r_ov, dims_ov)
                tgt_inv = (tgt_pts - t0[None, :]) @ R0
                w_tgt = _overlap_weight(tgt_inv, tgt_mask, src_pts, src_mask,
                                        r_ov, dims_ov)
                # fall back to the full cloud when the predicted overlap is
                # too thin to carry the sample (degenerate T0)
                w_src = jnp.where(jnp.sum(w_src) >= 64, w_src, src_mask)
                w_tgt = jnp.where(jnp.sum(w_tgt) >= 64, w_tgt, tgt_mask)
                skp, sok = _sample_keypoints(k_sr_s, src_pts, w_src,
                                             cfg.sr_kpts)
                tkp, tok = _sample_keypoints(k_sr_t, tgt_pts, w_tgt,
                                             cfg.sr_kpts)
                u_s = ume_from_ball_query(
                    src_pts, src_feat, skp, radius=cfg.ume_r_nn,
                    max_nn=cfg.ume_max_nn, p_mask=src_mask, k_mask=sok,
                    normalize=True)
                u_t = ume_from_ball_query(
                    tgt_pts, tgt_feat, tkp, radius=cfg.ume_r_nn,
                    max_nn=cfg.ume_max_nn, p_mask=tgt_mask, k_mask=tok,
                    normalize=True)
                m2, d2 = argmin_match(u_s, u_t, src_mask=sok, tgt_mask=tok)
                n2 = min(cfg.sr_hyps, cfg.sr_kpts)
                keep2 = jax.lax.top_k(-d2, n2)[1].astype(jnp.int32)
                G2 = u_s[keep2]
                H2 = u_t[jnp.maximum(m2[keep2], 0)]
                Ts2, _ = estimate_rigid_from_ume(
                    G2, H2, compute_distance=False,
                    sweeps=cfg.estimator_sweeps)
                ok2 = sok[keep2] & (d2[keep2] < jnp.float32(1e5))
                cand2 = consensus_refit(
                    Ts2, skp[keep2], tkp[jnp.maximum(m2[keep2], 0)], ok2,
                    tau=cfg.consensus_tau, n_cand=cfg.sr_cands,
                    nms_rot_deg=cfg.consensus_nms_rot_deg,
                    nms_trans=cfg.consensus_nms_trans)
                cand2 = jnp.concatenate([cand2, T0[None]], axis=0)
                rows = cfg.consensus_polish_rows
                pol2 = polish_candidates(cand2, corr_src_pts[:rows],
                                         corr_src_mask[:rows],
                                         corr_tgt_pts, corr_tgt_mask,
                                         radii=cfg.consensus_polish_radii,
                                         inner=cfg.consensus_polish_inner)
                cap2 = min(cfg.consensus_struct_cap, corr_src_pts.shape[0])
                sp2, sf2, sm2 = compact_structure(
                    corr_src_pts, fs_w, corr_src_mask, cap2)
                tp2, tf2, tm2 = compact_structure(
                    corr_tgt_pts, ft_w, corr_tgt_mask,
                    min(cfg.consensus_struct_cap, corr_tgt_pts.shape[0]))
                s2 = _score(cfg.corr_mode, sp2, sf2, sm2, tp2, tf2, tm2,
                            pol2, knn_k=cfg.corr_knn,
                            sigma=cfg.corr_kernel_sigma)
                return pol2[jnp.argmax(s2)]

            mapped0 = kp_s @ best_T[:3, :3].T + best_T[:3, 3]
            err0 = jnp.sum((mapped0 - kp_t) ** 2, axis=-1)
            r0sq = jnp.float32(cfg.consensus_gate_radius ** 2)
            n_ok0 = jnp.maximum(jnp.sum(pair_ok.astype(jnp.float32)), 1.0)
            inl0 = jnp.sum((pair_ok & (err0 < r0sq)).astype(jnp.float32)
                           ) / n_ok0
            best_T = jax.lax.cond(
                inl0 < jnp.float32(cfg.sr_gate_inliers),
                run_second_round, lambda t: t, best_T)
    return best_T, Ts, scores


def register_pair_features(
    cfg: RegistrationConfig,
    key: jax.Array,
    src_pts: jnp.ndarray, src_feat: jnp.ndarray, src_mask: jnp.ndarray,
    tgt_pts: jnp.ndarray, tgt_feat: jnp.ndarray, tgt_mask: jnp.ndarray,
    corr_src_pts: jnp.ndarray, corr_src_feat: jnp.ndarray, corr_src_mask: jnp.ndarray,
    corr_tgt_pts: jnp.ndarray, corr_tgt_feat: jnp.ndarray, corr_tgt_mask: jnp.ndarray,
    raw_src_pts: Optional[jnp.ndarray] = None,
    raw_src_mask: Optional[jnp.ndarray] = None,
    raw_tgt_pts: Optional[jnp.ndarray] = None,
    raw_tgt_mask: Optional[jnp.ndarray] = None,
    run_icp: bool = True,
) -> RegistrationResult:
    """Register a pair given per-voxel features (from the coloring model).

    src/tgt_*:    SEM-grid points + features (the UME/matching stage).
    corr_*:       correlator clouds (raw points downsampled, features
                  already copied; see copy_features_to_raw).
    raw_*:        full-resolution clouds for ICP (defaults to corr points).
    """
    best_T, _, _ = _hypotheses_and_select(
        cfg, key,
        src_pts, src_feat, src_mask, tgt_pts, tgt_feat, tgt_mask,
        corr_src_pts, corr_src_feat, corr_src_mask,
        corr_tgt_pts, corr_tgt_feat, corr_tgt_mask)

    if run_icp:
        T_ref, rmse, fit = refine_with_icp(
            cfg, best_T, corr_src_pts, corr_src_mask,
            corr_tgt_pts, corr_tgt_mask,
            raw_src_pts, raw_src_mask, raw_tgt_pts, raw_tgt_mask)
    else:
        T_ref, rmse, fit = best_T, jnp.float32(0.0), jnp.float32(0.0)
    return RegistrationResult(
        T_init=best_T, T_refined=T_ref, icp_rmse=rmse, icp_fitness=fit)


# ---------------------------------------------------------------------------
# Hungarian parity mode (reference evaluate.py:216-222,
# hungarian_matching_flag) — a two-phase hybrid: the assignment is a host
# algorithm (native C++ Jonker-Volgenant, as the reference uses scipy's
# linear_sum_assignment on the CPU), so the pipeline splits into a jitted
# descriptor/distance phase, the host assignment + probabilistic filter,
# and a jitted hypothesize-select phase. Off in every shipped config;
# perf-secondary by construction (the full distance matrix is fetched).
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def _ume_and_distance(
    cfg: RegistrationConfig,
    key: jax.Array,
    src_pts, src_feat, src_mask,
    tgt_pts, tgt_feat, tgt_mask,
):
    from umeregrobust_tpu.core.ume import ume_pairwise_distance

    k_src, k_tgt = jax.random.split(key)
    n_init = cfg.num_init_keypoints if cfg.filter_by_ume_dist else cfg.ume_n_samples
    src_kp, src_kp_ok = _sample_keypoints(
        k_src, src_pts, src_mask, n_init,
        struct_boost=cfg.kp_struct_boost, struct_dz=cfg.kp_struct_dz)
    tgt_kp, tgt_kp_ok = _sample_keypoints(
        k_tgt, tgt_pts, tgt_mask, n_init,
        struct_boost=cfg.kp_struct_boost, struct_dz=cfg.kp_struct_dz)
    ume_src = ume_from_ball_query(
        src_pts, src_feat, src_kp, radius=cfg.ume_r_nn, max_nn=cfg.ume_max_nn,
        p_mask=src_mask, k_mask=src_kp_ok, normalize=True)
    ume_tgt = ume_from_ball_query(
        tgt_pts, tgt_feat, tgt_kp, radius=cfg.ume_r_nn, max_nn=cfg.ume_max_nn,
        p_mask=tgt_mask, k_mask=tgt_kp_ok, normalize=True)
    D = ume_pairwise_distance(ume_src, ume_tgt)
    # invalid keypoints must never be assigned: push them beyond any real
    # subspace distance (<= sqrt(8)) but keep the matrix finite for JV
    D = jnp.where(src_kp_ok[:, None] & tgt_kp_ok[None, :], D, 1e3)
    return ume_src, ume_tgt, D


@partial(jax.jit, static_argnames=("cfg",))
def _select_from_matches(
    cfg: RegistrationConfig,
    key: jax.Array,
    ume_src, ume_tgt, m_src, m_tgt,
    corr_src_pts, corr_src_feat, corr_src_mask,
    corr_tgt_pts, corr_tgt_feat, corr_tgt_mask,
):
    G = ume_src[m_src]
    H = ume_tgt[m_tgt]
    Ts, _ = estimate_rigid_from_ume(G, H, compute_distance=False,
                                    sweeps=cfg.estimator_sweeps)
    best_T, scores = select_best_transform(
        corr_src_pts, corr_src_feat, corr_src_mask,
        corr_tgt_pts, corr_tgt_feat, corr_tgt_mask,
        Ts, sigma=cfg.corr_kernel_sigma, knn_k=cfg.corr_knn,
        var_knn=cfg.corr_var_knn, coarse_src=cfg.corr_coarse_src,
        coarse_tgt=cfg.corr_coarse_tgt,
        rescore_top=cfg.corr_rescore_top, key=key, mode=cfg.corr_mode,
        triage_src=cfg.corr_triage_src, triage_tgt=cfg.corr_triage_tgt,
        triage_top=cfg.corr_triage_top,
        var_anchors=cfg.corr_var_anchors)
    return best_T, scores


def register_pair_hungarian(
    cfg: RegistrationConfig,
    key: jax.Array,
    src_pts, src_feat, src_mask,
    tgt_pts, tgt_feat, tgt_mask,
    corr_src_pts, corr_src_feat, corr_src_mask,
    corr_tgt_pts, corr_tgt_feat, corr_tgt_mask,
    raw_src_pts=None, raw_src_mask=None,
    raw_tgt_pts=None, raw_tgt_mask=None,
    run_icp: bool = True,
    rng=None,
) -> RegistrationResult:
    """Reference-parity registration with Hungarian keypoint matching
    (evaluate.py:216-232): 1:1 assignment over the full UME distance
    matrix instead of per-source argmin, then the same probabilistic
    filter over the matched distances. See module note above for the
    host/device split."""
    import numpy as np

    from umeregrobust_tpu.pipeline.matching import hungarian_match

    k_ume, k_corr = jax.random.split(key)
    ume_src, ume_tgt, D = _ume_and_distance(
        cfg, k_ume, src_pts, src_feat, src_mask, tgt_pts, tgt_feat, tgt_mask)
    Dh = np.asarray(D)
    m = hungarian_match(Dh)  # (K, 2), K = min(M, N)
    dist = Dh[m[:, 0], m[:, 1]]
    valid = dist < 1e2
    if not valid.any():  # degenerate pair: no real keypoints at all
        valid = np.ones_like(valid)
    if cfg.filter_by_ume_dist:
        rng = rng if rng is not None else np.random.default_rng(0)
        a = np.exp((1.0 - dist) / cfg.tau) * valid
        s = a.sum()
        p = a / s if s > 0 else valid / valid.sum()
        k = min(cfg.ume_n_samples, int(valid.sum()))
        sel = rng.choice(len(m), size=k, replace=False, p=p)
        m = m[sel]
    else:
        m = m[valid]
    # pad to the static hypothesis count by repeating the best match
    # (duplicate hypotheses are harmless to the argmax selection)
    K = cfg.ume_n_samples
    best_row = m[np.argmin(Dh[m[:, 0], m[:, 1]])]
    if len(m) < K:
        m = np.concatenate([m, np.tile(best_row, (K - len(m), 1))], axis=0)
    m = m[:K]

    best_T, _ = _select_from_matches(
        cfg, k_corr, ume_src, ume_tgt,
        jnp.asarray(m[:, 0].astype(np.int32)),
        jnp.asarray(m[:, 1].astype(np.int32)),
        corr_src_pts, corr_src_feat, corr_src_mask,
        corr_tgt_pts, corr_tgt_feat, corr_tgt_mask)

    if run_icp:
        T_ref, rmse, fit = refine_with_icp(
            cfg, best_T, corr_src_pts, corr_src_mask,
            corr_tgt_pts, corr_tgt_mask,
            raw_src_pts, raw_src_mask, raw_tgt_pts, raw_tgt_mask)
    else:
        T_ref, rmse, fit = best_T, jnp.float32(0.0), jnp.float32(0.0)
    return RegistrationResult(
        T_init=best_T, T_refined=T_ref, icp_rmse=rmse, icp_fitness=fit)
