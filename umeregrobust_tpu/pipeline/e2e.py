"""Fully-fused per-pair registration: one compiled program per pair.

The remote-TPU execution path pays a fixed per-launch latency, and the
benchmark loop is latency-bound at batch_size=1 — so the entire per-pair
flow (geometry pyramid, two backbone forwards, feature transfer, UME
matching, hypothesis scoring, ICP) is fused into a single jit here. Host
code only pads inputs and reads back one 4x4 matrix per pair.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from umeregrobust_tpu.models.resunet import ArchSpec, build_unet_geometry, resunet_apply
from umeregrobust_tpu.pipeline.registration import (
    RegistrationConfig,
    _hypotheses_and_select,
    copy_features_to_raw,
    copy_features_to_raw_grid,
    refine_with_icp,
)

__all__ = ["register_pair_e2e", "pair_features_e2e"]


@partial(jax.jit, static_argnames=("arch", "caps", "cfg", "compute_dtype"))
def register_pair_e2e(
    params: Dict[str, Any],
    state: Dict[str, Any],
    arch: ArchSpec,
    caps: Tuple[int, ...],
    cfg: RegistrationConfig,
    key: jax.Array,
    src_coords: jnp.ndarray, src_grid: jnp.ndarray, src_mask: jnp.ndarray,
    tgt_coords: jnp.ndarray, tgt_grid: jnp.ndarray, tgt_mask: jnp.ndarray,
    corr_src_pts: jnp.ndarray, corr_src_mask: jnp.ndarray,
    corr_tgt_pts: jnp.ndarray, corr_tgt_mask: jnp.ndarray,
    raw_src_pts: jnp.ndarray | None = None,
    raw_src_mask: jnp.ndarray | None = None,
    raw_tgt_pts: jnp.ndarray | None = None,
    raw_tgt_mask: jnp.ndarray | None = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full pipeline in one launch. Returns (T_init, T_refined).

    Both clouds run through ONE geometry build and ONE backbone forward:
    the coordinate hash key carries the batch index (src=its own id,
    tgt=src+1), so a single sparse pyramid holds both clouds and the conv
    matmuls see twice the rows (better MXU utilization than two half-size
    passes; also one sort pass instead of two).

    raw_*: optional full-resolution clouds for the final ICP polish
    (reference refine_registration runs on the COMPLETE raw clouds,
    evaluate.py:63-110; cfg.icp_raw_iter controls the stage).
    """
    N = src_coords.shape[0]
    # named scopes flow into XLA op metadata -> fusion names, so
    # tools/trace_e2e.py can attribute device time by pipeline stage
    with jax.named_scope("geometry"):
        tgt_b = tgt_coords.at[:, 0].add(jnp.where(tgt_mask, 1, 0))
        coords2 = jnp.concatenate([src_coords, tgt_b], axis=0)
        mask2 = jnp.concatenate([src_mask, tgt_mask])
        caps2 = tuple(2 * c for c in caps)
        geom = build_unet_geometry(coords2, mask2, arch, caps2)
    with jax.named_scope("forward"):
        fin = jnp.ones((2 * N, 1), jnp.float32) * mask2[:, None]
        both, _ = resunet_apply(params, state, geom, fin, arch,
                                train=False, compute_dtype=compute_dtype)
        feats = {"src": both[:N], "tgt": both[N:]}

    with jax.named_scope("feat_to_raw"):
        if cfg.feat_copy_radius is not None:
            def _copy(qp, qm, sp, sf, sm):
                return copy_features_to_raw_grid(
                    qp, qm, sp, sf, sm, radius=cfg.feat_copy_radius,
                    budget=cfg.feat_copy_budget, dims=cfg.feat_copy_dims)
        else:
            _copy = copy_features_to_raw
        cs_f = _copy(corr_src_pts, corr_src_mask, src_grid,
                     feats["src"], src_mask)
        ct_f = _copy(corr_tgt_pts, corr_tgt_mask, tgt_grid,
                     feats["tgt"], tgt_mask)

    with jax.named_scope("hypotheses"):
        best_T, _, _ = _hypotheses_and_select(
            cfg, key,
            src_grid, feats["src"], src_mask, tgt_grid, feats["tgt"], tgt_mask,
            corr_src_pts, cs_f, corr_src_mask, corr_tgt_pts, ct_f,
            corr_tgt_mask)

    with jax.named_scope("icp"):
        T_cur, _, _ = refine_with_icp(
            cfg, best_T, corr_src_pts, corr_src_mask,
            corr_tgt_pts, corr_tgt_mask,
            raw_src_pts, raw_src_mask, raw_tgt_pts, raw_tgt_mask)
    return best_T, T_cur


@partial(jax.jit, static_argnames=("arch", "caps", "cfg", "compute_dtype"))
def register_pairs_batched(
    params: Dict[str, Any],
    state: Dict[str, Any],
    arch: ArchSpec,
    caps: Tuple[int, ...],
    cfg: RegistrationConfig,
    keys: jax.Array,  # (B, 2) PRNG keys
    src_coords: jnp.ndarray, src_grid: jnp.ndarray, src_mask: jnp.ndarray,
    tgt_coords: jnp.ndarray, tgt_grid: jnp.ndarray, tgt_mask: jnp.ndarray,
    corr_src_pts: jnp.ndarray, corr_src_mask: jnp.ndarray,
    corr_tgt_pts: jnp.ndarray, corr_tgt_mask: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vmap of register_pair_e2e over a leading batch of pairs.

    Benchmark pairs are independent (reference evaluates batch_size=1
    sequentially, evaluate.py:155-160); batching them through one program
    amortizes fixed overheads and fills the MXU. Shard the batch axis over
    the 'dp' mesh for multi-chip throughput. Note the data-dependent
    while_loops (ICP, hash probing) run until the slowest pair finishes.
    """

    def one(key, sc, sg, sm, tc, tg, tm, csp, csm, ctp, ctm):
        return register_pair_e2e(
            params, state, arch, caps, cfg, key,
            sc, sg, sm, tc, tg, tm, csp, csm, ctp, ctm,
            compute_dtype=compute_dtype)

    return jax.vmap(one)(
        keys, src_coords, src_grid, src_mask, tgt_coords, tgt_grid, tgt_mask,
        corr_src_pts, corr_src_mask, corr_tgt_pts, corr_tgt_mask)


@partial(jax.jit, static_argnames=("arch", "caps", "compute_dtype"))
def pair_features_e2e(
    params: Dict[str, Any],
    state: Dict[str, Any],
    arch: ArchSpec,
    caps: Tuple[int, ...],
    src_coords: jnp.ndarray, src_grid: jnp.ndarray, src_mask: jnp.ndarray,
    tgt_coords: jnp.ndarray, tgt_grid: jnp.ndarray, tgt_mask: jnp.ndarray,
    corr_src_pts: jnp.ndarray, corr_src_mask: jnp.ndarray,
    corr_tgt_pts: jnp.ndarray, corr_tgt_mask: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The feature stage of register_pair_e2e alone (fused two-cloud
    forward + 1-NN transfer to the correlator clouds) — for flows whose
    matching step runs on the host (the Hungarian parity mode,
    registration.register_pair_hungarian). Returns
    (src_feat, tgt_feat, corr_src_feat, corr_tgt_feat)."""
    N = src_coords.shape[0]
    tgt_b = tgt_coords.at[:, 0].add(jnp.where(tgt_mask, 1, 0))
    coords2 = jnp.concatenate([src_coords, tgt_b], axis=0)
    mask2 = jnp.concatenate([src_mask, tgt_mask])
    caps2 = tuple(2 * c for c in caps)
    geom = build_unet_geometry(coords2, mask2, arch, caps2)
    fin = jnp.ones((2 * N, 1), jnp.float32) * mask2[:, None]
    both, _ = resunet_apply(params, state, geom, fin, arch,
                            train=False, compute_dtype=compute_dtype)
    src_feat, tgt_feat = both[:N], both[N:]
    cs_f = copy_features_to_raw(corr_src_pts, corr_src_mask, src_grid,
                                src_feat, src_mask)
    ct_f = copy_features_to_raw(corr_tgt_pts, corr_tgt_mask, tgt_grid,
                                tgt_feat, tgt_mask)
    return src_feat, tgt_feat, cs_f, ct_f
