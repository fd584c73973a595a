"""Radiance-field tracer: raymarch + masked volume integration.

TPU-native re-design of ``wisp/tracers/packed_rf_tracer.py`` (reference).
The reference packs a variable number of samples per ray and integrates with
kaolin's ``exponential_integration`` segmented scan; here every ray carries a
fixed sample axis with a boolean mask — masked samples contribute zero
optical thickness, which is mathematically identical to packing — so the
whole trace is one static-shape XLA program.

Integration math (matches spc_render.exponential_integration, exclusive):
    tau_i   = density_i * delta_i * mask_i
    T_i     = exp(-cumsum_exclusive(tau))
    w_i     = T_i * (1 - exp(-tau_i))
    rgb     = sum_i w_i * c_i ;  alpha = sum_i w_i ;  depth = sum_i w_i * t_i
Background compositing follows the reference exactly
(packed_rf_tracer.py:149-153): white -> (1 - alpha) + rgb, black -> alpha*rgb.

An optional fixed-budget sample compaction (``max_samples``) evaluates the
field only on (up to) K occupied samples — the TPU analog of the reference's
packing, with a static K instead of data-dependent shapes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from shacira_tpu.core.rays import Rays
from shacira_tpu.accel import occupancy as occ


@dataclass(frozen=True)
class RFTracerConfig:
    raymarch_type: str = 'ray'     # 'ray' | 'voxel'
    num_steps: int = 64
    bg_color: str = 'white'
    max_intersections: int = 64    # 'voxel' mode DDA budget
    max_samples: int = 0           # >0: compact to K occupied samples
    # segmented 'ray' march: test SEGMENTS of consecutive samples against a
    # dilated coarse occupancy grid first, and fine-query/evaluate only the
    # samples of surviving segments.  Cuts the per-sample occupancy gathers
    # (the march is gather-latency-bound like everything else on TPU) by the
    # dead-segment fraction.  0 disables; requires max_samples > 0.
    segment_size: int = 0          # samples per segment (must divide num_steps)
    seg_budget: int = 0            # live-segment budget (0: 8*max_samples/G)
    coarse_level: int = 5          # coarse grid res = 2**coarse_level
    seg_dilation: int = 1          # coarse-cell dilation radius; must cover
                                   # half a segment's length (check with
                                   # validate_segment_cover)
    # paged-encode path (ops/paged_hash.py): second-stage SEGMENT budget for
    # field evaluation.  >0 enables grouping: live segments are compacted to
    # this budget, grouped by coarse cell, the grid encode runs on all their
    # samples via the paged kernels, and only then are rows compacted to
    # max_samples for the MLP.  Requires an encode/head-split field.
    eval_seg_budget: int = 0
    group_segs_per_block: int = 8  # segments per paged-kernel block
    group_res: int = 8             # grouping cells/axis = grid page_res // 2
                                   # (trainers derive it from the grid spec)
    # paged grouping granularity: samples per GROUPED sub-segment (0 = the
    # whole culling segment).  Finer page geometries (page_res 32) need
    # shorter grouped spans to satisfy the cover bound at the coarsest
    # paged LODs; sub-segmenting keeps the cheap 16-sample culling while
    # grouping at 8 samples.  Must divide segment_size.
    group_seg_size: int = 0
    # 'exact': per-sample fine occupancy is queried for ALL stage-1 segments
    # (seg_budget of them) and stage-2 keeps only fine-occupied segments.
    # 'deferred' (paged path only): stage-2 keeps the coarse-live prefix —
    # the already-validated conservative midpoint test — and the per-sample
    # fine query runs only on the eval_seg_budget survivors (~5x fewer
    # rows; the gather-latency fine query is a top step cost).  Renders
    # identically when eval_seg_budget covers the fine-live segments; under
    # budget pressure coarse-live-but-fine-empty segments can evict real
    # ones (same stride-uniform drop rule as 'exact').
    # 'kernel' (paged 'ray' path, deferred-direct split only): like
    # 'deferred', but the per-sample fine query runs INSIDE the paged
    # encode kernels as a bit-packed occupancy pseudo-LOD
    # (ops/paged_hash.occ_slab_tables) — no XLA gathers at all; grouping
    # liveness uses a 1-row-per-sub-segment dilated midpoint test
    # (occ_state['fine_dil'], built once per prune by the trainer).
    # Same exactness caveats as 'deferred'; grouping admits slightly more
    # blocks (dilated vs exact sub-segment liveness).
    fine_mode: str = 'exact'       # 'exact' | 'deferred' | 'kernel'
    # transmittance culling: drop segments ('ray') / cells ('voxel') whose
    # approximate accumulated optical depth — from the occupancy grid's
    # NGP-style decayed-max density cache (accel/occupancy.py prune_update,
    # ref nerf.py:150-185) — already exceeds this threshold, i.e. whose
    # estimated transmittance is below exp(-term_tau).  Samples behind that
    # point carry ~zero integration weight (and ~zero gradient), so culling
    # them cuts every downstream stage (grouping, paged encode, compaction,
    # head) by the occluded fraction at negligible quality cost.  The
    # estimate is the decayed MAX density per cell (an overestimate), so
    # pick term_tau with headroom (e.g. 11.5 ~ T < 1e-5).  0 disables.
    # Before the first prune the density cache is zero and nothing is
    # culled (conservative).
    term_tau: float = 0.0
    # two-level cull (lean stage-1 only): test SUPER-segments of
    # ``super_factor`` consecutive culling segments first against a
    # ``super_dilation``-dilated occupancy (conservative: the dilated cell
    # of a super midpoint covers the whole super-segment —
    # validate_segment_cover checks the bound), compact the survivors, and
    # run the per-segment midpoint/term tests only on their
    # ``super_factor * budget`` segments.  Cuts the fixed [R, ns]
    # gather + 524K-slot compaction to [R, ns/F] (+ sparse segment rows).
    # Exactly the same segments survive as the one-level test when
    # budgets don't truncate (the super test is conservative).
    super_factor: int = 0          # segments per super-segment (0/1 = off)
    super_dilation: int = 0        # dilation of the super midpoint test
    # lean stage-1 (fine_mode='deferred' 'ray' marching only): never
    # materialize the [R, num_steps] depth/delta/jitter ladders.  Segment
    # midpoints are analytic (segment centers; the cover bound already
    # slack-covers jitter), stage-2 sample depths are recomputed from the
    # surviving segment ids with a counter-hash jitter keyed on (step seed,
    # local segment id, sample) — under shard_map each device keys on its
    # LOCAL ids, so jitter offsets repeat across device shards (harmless:
    # offsets stay iid across steps; only their cross-ray correlation
    # pattern differs from the dense draw) — and deltas are the uniform
    # span/(num_steps-1) quadrature (each sample is a stratified estimate
    # of its bin; the dense path's diff-of-jittered-depths has the same
    # mean).  Also compacts stage-1 directly to eval_seg_budget (no
    # seg_budget intermediate).  Rendering is statistically identical but
    # not bit-equal to the dense path (different jitter stream).
    lean_stage1: bool = False


def march_jitter_shape(cfg: RFTracerConfig, num_rays: int):
    """Shape of the bulk U(0,1) jitter array :func:`trace` consumes when the
    caller pre-draws it instead of passing a key (see occ.march_uniform —
    the shard_map'd trace path)."""
    if cfg.raymarch_type == 'voxel':
        return (num_rays, cfg.max_intersections, cfg.num_steps)
    if cfg.lean_stage1 and cfg.fine_mode == 'deferred':
        # lean mode needs only a per-step seed source (2 uniforms -> one
        # uint32 counter-hash seed); broadcast to every device so each
        # derives the same per-segment jitter
        return (2,)
    return (num_rays, cfg.num_steps)


def _lean_seed(u):
    """Per-step uint32 hash seed from either a PRNG key or the (2,)
    pre-drawn uniform array of :func:`march_jitter_shape` (lean mode)."""
    if hasattr(u, 'ndim') and u.ndim == 1 and u.shape[0] == 2 \
            and jnp.issubdtype(u.dtype, jnp.floating):
        lo = jnp.floor(u[0] * 65536.0).astype(jnp.uint32)
        hi = jnp.floor(u[1] * 65536.0).astype(jnp.uint32)
        return lo | (hi << jnp.uint32(16))
    return jax.random.randint(u, (), 0, np.int64(2 ** 31) - 1,
                              dtype=jnp.int32).astype(jnp.uint32)


def _hash01(seed, idx):
    """Stateless counter-hash jitter: uint32 mix of (seed, idx) -> U[0,1).

    murmur3-style finalizer — statistically adequate for stratified sample
    jitter; deterministic in (seed, id), so a trace re-run with the same
    seed reproduces its samples exactly."""
    x = idx.astype(jnp.uint32) + seed
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x.astype(jnp.float32) * jnp.float32(2.0 ** -32)


def per_device_cfg(cfg: RFTracerConfig, n: int) -> RFTracerConfig:
    """Per-device tracer config for a trace shard_map'd over the ray axis.

    Rays are independent, so a mesh of ``n`` devices runs the whole trace —
    march, budgeted compactions, segment grouping, paged encode kernels,
    compact integration — per device on R/n rays with every GLOBAL row
    budget divided by ``n``.  Per-ray quantities (num_steps,
    max_intersections, segment geometry) are unchanged.  With budgets
    ample enough that nothing truncates, the sharded trace integrates
    exactly the same samples as the single-device one; under budget
    pressure the stride-drop rule applies per device shard instead of
    globally (same uniform-drop semantics, device-local).

    Raises ValueError when a budget does not divide ``n`` (callers fall
    back to the GSPMD path).
    """
    import dataclasses

    def div(v: int, name: str) -> int:
        if v <= 0:
            return v
        if v % n:
            raise ValueError(
                f'{name}={v} must divide the mesh size {n} for the '
                f'shard_map trace')
        return v // n

    return dataclasses.replace(
        cfg,
        max_samples=div(cfg.max_samples, 'max_samples'),
        seg_budget=div(cfg.seg_budget, 'seg_budget'),
        eval_seg_budget=div(cfg.eval_seg_budget, 'eval_seg_budget'))


def integration_weights(density, deltas, mask):
    """Per-sample volume-rendering weights w_i (exclusive transmittance)."""
    tau = density * deltas * mask
    cum = jnp.cumsum(tau, axis=-1)
    transmittance = jnp.exp(-(cum - tau))          # exclusive
    return transmittance * (1.0 - jnp.exp(-tau))


def volume_integrate(color, density, deltas, depth, mask):
    """Masked exclusive volume integration.

    Args:
        color [R,S,3], density [R,S], deltas [R,S], depth [R,S], mask [R,S].
    Returns:
        rgb [R,3], alpha [R,1], depth_out [R,1]
    """
    w = integration_weights(density, deltas, mask)
    rgb = jnp.sum(w[..., None] * color, axis=-2)
    alpha = jnp.sum(w, axis=-1, keepdims=True)
    depth_out = jnp.sum(w * depth, axis=-1, keepdims=True)
    return rgb, alpha, depth_out


def _stride_compact(flat_mask, budget: int):
    """Budgeted stable compaction of a boolean mask.

    When the budget overflows (e.g. before the first pruning pass fills the
    occupancy grid), drop by stride so remaining entries stay uniformly
    distributed instead of starving the tail.

    Returns (src [budget] int32 source positions, valid [budget] bool,
    inv [n] int32 slot per source position, budget for dropped rows — the
    inverse map, letting differentiable compactions run their backward as a
    gather via paged_hash.permute_rows instead of an XLA row-scatter).
    """
    n = flat_mask.shape[0]
    cs = jnp.cumsum(flat_mask.astype(jnp.int32))              # inclusive
    total = cs[-1]
    stride = jnp.maximum(1, -(-total // budget))              # ceil div
    # slot of a kept row is its live-rank // stride directly — no second
    # cumsum needed.  (A searchsorted/gather formulation was measured
    # slower on TPU: budget * log2(n) binary-search gathers lose to the
    # single n-row scatter once budget approaches n.)
    pos = cs - 1                                              # live rank
    q = pos // stride
    kept = flat_mask & (pos - q * stride == 0) & (q < budget)
    slots = jnp.where(kept, q, budget).astype(jnp.int32)      # dropped -> OOB
    src = jnp.zeros((budget,), jnp.int32)
    src = src.at[slots].set(jnp.arange(n, dtype=jnp.int32), mode='drop')
    n_keep = -(-total // stride)                              # ceil
    valid = jnp.arange(budget) < jnp.minimum(n_keep, budget)
    return src, valid, slots


def _eval_field(field_fn, coords, dirs):
    """Normalize a field's outputs to (color, density, extras-dict).

    ``field_fn`` may return (color [...,3], density [...,1]) or additionally
    a dict of extra per-sample channels {name: [..., k]} to volume-integrate
    (the reference integrates arbitrary extra nef channels,
    packed_rf_tracer.py:155-168).
    """
    out = field_fn(coords, dirs)
    if len(out) == 3:
        return out
    color, density = out
    return color, density, {}


def _segmented_cumsum_excl(tau, ray_start):
    """Exclusive per-segment prefix sum of ``tau`` [K] with segment
    boundaries at ``ray_start`` [K] bool.

    A log-depth associative scan over (flag, sum) pairs — for fixed flags
    the result is a *linear* function of tau, so autodiff gradients are
    exact, and magnitudes never cross ray boundaries (no cancellation, in
    contrast to a global cumsum minus per-ray base)."""
    def combine(a, b):
        a_flag, a_sum = a
        b_flag, b_sum = b
        return a_flag | b_flag, jnp.where(b_flag, b_sum, a_sum + b_sum)

    _, incl = jax.lax.associative_scan(combine, (ray_start, tau))
    return incl - tau


def volume_integrate_compact(color, density, deltas, depth, valid, ray_id,
                             num_rays: int, extras=None):
    """Compact-form masked volume integration (the TPU packing analog).

    Rows must be sorted by (ray, sample-depth) over the valid prefix — the
    stable-compaction invariant of :func:`_stride_compact`.  Mathematically
    identical to running :func:`volume_integrate` on a dense scatter-back of
    the rows (absent/invalid samples carry zero optical thickness) but never
    materializes the dense [R, S] buffers: the per-ray exclusive cumsum is a
    segmented associative scan and the per-ray reductions run as one f32
    one-hot matmul (``pallas_scatter.segment_sum``) whose backward is a
    gather — so neither direction pays an XLA row-scatter.

    Args:
        color [K,3], density [K], deltas [K], depth [K], valid [K] bool,
        ray_id [K] int32 (non-decreasing over valid rows), num_rays R.
        extras: optional {name: [K, k]} per-sample channels.
    Returns:
        dict with rgb [R,3], alpha [R,1], depth [R,1] and one [R,k] entry
        per extra channel (pre-background-compositing).
    """
    from shacira_tpu.ops import pallas_scatter

    tau = density * deltas * jnp.where(valid, 1.0, 0.0)
    ray_start = jnp.concatenate(
        [jnp.ones((1,), bool), ray_id[1:] != ray_id[:-1]])
    transmittance = jnp.exp(-_segmented_cumsum_excl(tau, ray_start))
    w = transmittance * (1.0 - jnp.exp(-tau))      # 0 exactly when invalid
    cols = [w[:, None] * color, w[:, None], (w * depth)[:, None]]
    names, sizes = [], [3, 1, 1]
    if extras:
        for name, val in extras.items():
            cols.append(w[:, None] * val)
            names.append(name)
            sizes.append(val.shape[-1])
    payload = jnp.concatenate(cols, axis=-1).astype(jnp.float32)
    sums = pallas_scatter.segment_sum(ray_id, payload, num_rays)
    out = {'rgb': sums[:, :3], 'alpha': sums[:, 3:4],
           'depth': sums[:, 4:5]}
    off = 5
    for name, k in zip(names, sizes[3:]):
        out[name] = sums[:, off:off + k]
        off += k
    return out


def _compact_eval_rows(field_fn, flat_samples, flat_dirs, flat_mask,
                       max_samples: int):
    """Evaluate the field on up to K occupied rows (stable stride
    compaction).  Returns (src_idx [K], valid [K], color [K,3],
    density [K], extras {name: [K,k]})."""
    src_idx, k_valid, _ = _stride_compact(flat_mask, max_samples)
    k_color, k_density, k_extras = _eval_field(
        field_fn, flat_samples[src_idx], flat_dirs[src_idx])
    return src_idx, k_valid, k_color, k_density[..., 0], k_extras


def _coarse_res(cfg: RFTracerConfig, occ_cfg: occ.OccupancyGridConfig) -> int:
    """Coarse grid resolution, clamped to the fine grid's (coarser grids
    enlarge the cover radius, which stays conservative)."""
    return min(2 ** cfg.coarse_level, occ_cfg.res)


def segment_cover_radius(cfg: RFTracerConfig,
                         occ_cfg: occ.OccupancyGridConfig) -> float:
    """Spatial radius around a segment midpoint covered by its dilated
    coarse cell."""
    return cfg.seg_dilation * (2.0 / _coarse_res(cfg, occ_cfg))


def super_dilation_for(cfg: RFTracerConfig, occ_cfg: occ.OccupancyGridConfig,
                       dist_min: float, dist_max: float) -> int:
    """Minimal conservative dilation for the super-segment midpoint test:
    the dilated cell must cover the whole ``super_factor * segment_size``
    sample span (+1 sample of jitter slack)."""
    f = max(cfg.super_factor, 1)
    half = (float(dist_max) - float(dist_min)) * (
        f * cfg.segment_size / 2 + 1) / cfg.num_steps
    rc = _coarse_res(cfg, occ_cfg)
    return int(np.ceil(half / (2.0 / rc)))


def validate_segment_cover(cfg: RFTracerConfig,
                           occ_cfg: occ.OccupancyGridConfig,
                           dist_min: float, dist_max: float):
    """Raise unless the dilated coarse cell of a segment midpoint covers
    every sample of the segment (the conservativeness precondition of
    segmented marching).  Call with concrete ray distance bounds."""
    if cfg.segment_size <= 0:
        return
    if cfg.num_steps % cfg.segment_size:
        raise ValueError(
            f'segment_size {cfg.segment_size} must divide num_steps '
            f'{cfg.num_steps}')
    seg_half = (float(dist_max) - float(dist_min)) * (
        cfg.segment_size / 2 + 1) / cfg.num_steps
    cover = segment_cover_radius(cfg, occ_cfg)
    if seg_half > cover:
        raise ValueError(
            f'segment half-length {seg_half:.4f} exceeds coarse cover '
            f'{cover:.4f}; raise seg_dilation or lower coarse_level')
    if cfg.super_factor > 1:
        if not (cfg.lean_stage1 and cfg.fine_mode == 'deferred'):
            raise ValueError('super_factor requires lean_stage1 + deferred')
        ns = cfg.num_steps // cfg.segment_size
        if ns % cfg.super_factor:
            raise ValueError(
                f'super_factor {cfg.super_factor} must divide the '
                f'{ns}-segment ladder')
        need = super_dilation_for(cfg, occ_cfg, dist_min, dist_max)
        if cfg.super_dilation < need:
            raise ValueError(
                f'super_dilation {cfg.super_dilation} < required {need} '
                f'for super_factor {cfg.super_factor}')


def _coarse_dilated_occupancy(occ_state, occ_cfg: occ.OccupancyGridConfig,
                              rc: int, dilation: int):
    """OR-pool fine occupancy to rc cells per axis, dilate by ``dilation``
    coarse cells (3D max filter) so a single midpoint lookup conservatively
    covers a whole neighborhood."""
    f = occ_cfg.res // rc
    o = occ_state['occ'].reshape(rc, f, rc, f, rc, f).any(axis=(1, 3, 5))
    if dilation > 0:
        k = 2 * dilation + 1
        o = o.astype(jnp.uint8)
        for axis in range(3):       # separable max filter (3 cheap passes)
            win = [1, 1, 1]
            win[axis] = k
            o = jax.lax.reduce_window(o, np.uint8(0), jax.lax.max,
                                      tuple(win), (1, 1, 1), 'SAME')
    return o.astype(bool)


def coarse_dilated_occupancy(occ_state, occ_cfg: occ.OccupancyGridConfig,
                             cfg: RFTracerConfig):
    """The segmented march's coarse culling grid.  Occupancy only changes at
    prune time, so trainers precompute this once per prune and stash it as
    ``occ_state['coarse']`` instead of re-deriving it every step."""
    return _coarse_dilated_occupancy(occ_state, occ_cfg,
                                     _coarse_res(cfg, occ_cfg),
                                     cfg.seg_dilation)


def coarse_packed_grid(occ_state, occ_cfg: occ.OccupancyGridConfig,
                       cfg: RFTracerConfig):
    """Packed coarse grid for term_tau > 0: ``[rc, rc, rc, 2]`` f32 holding
    (dilated coarse occupancy, max-pooled density cache).  Channel 0 is the
    same liveness bit as :func:`coarse_dilated_occupancy`; channel 1 is the
    UNdilated max-pool of the NGP decayed-max density (dilating it would
    attribute a surface's opacity to its empty neighbors).  Packing both
    into one array keeps stage-1 at a single gather — gather cost is flat
    in row width on TPU, so the extra channel is free."""
    rc = _coarse_res(cfg, occ_cfg)
    o = _coarse_dilated_occupancy(occ_state, occ_cfg, rc, cfg.seg_dilation)
    f = occ_cfg.res // rc
    d = occ_state['density'].reshape(rc, f, rc, f, rc, f).max(axis=(1, 3, 5))
    return jnp.stack([o.astype(jnp.float32), d], axis=-1)


def coarse_segment_live(occ_state, occ_cfg, cfg: RFTracerConfig, rays: Rays,
                        rng):
    """Stage-1 segment cull: (depth [R, S], deltas [R, S], mask_c [R, ns]).

    Sampling is identical to raymarch_ray (same jitter draw); a segment is
    live when its midpoint's dilated coarse cell is occupied (conservative:
    the dilated cell covers the whole segment — see validate_segment_cover).
    With ``cfg.term_tau > 0`` a segment must also not sit behind an
    estimated accumulated optical depth of term_tau (transmittance
    culling; see RFTracerConfig).  Also used standalone by the trainer's
    adaptive-budget probe."""
    G = cfg.segment_size
    S = cfg.num_steps
    assert S % G == 0, (S, G)
    ns = S // G
    R = rays.origins.shape[0]

    # same sampling as occ.raymarch_ray (octree_as.py:252-259)
    base = jnp.linspace(0.0, 1.0, S)
    jitter = occ.march_uniform(rng, (R, S)) / S
    t = base[None, :] + jitter
    dmin = jnp.broadcast_to(rays.dist_min, (R,))[:, None]
    dmax = jnp.broadcast_to(rays.dist_max, (R,))[:, None]
    depth = t * (dmax - dmin) + dmin                          # [R, S]
    deltas = jnp.diff(depth, axis=-1, prepend=dmin)

    # NOTE: conservativeness (dilated coarse cell of the midpoint covers the
    # whole segment) cannot be checked here — dist bounds are traced.
    # MultiviewTrainer validates at construction; direct users should call
    # validate_segment_cover() with their concrete distance bounds.
    # (Term-culling chord inside _segment_liveness uses G/(S-1) — the
    # actual sample spacing — so the estimate stays conservative at small
    # S; ADVICE r4.)
    dseg = depth.reshape(R, ns, G)
    t_mid = 0.5 * (dseg[..., 0] + dseg[..., -1])              # [R, ns]
    mask_c = _segment_liveness(occ_state, occ_cfg, cfg, rays, t_mid,
                               dmin, dmax)
    return depth, deltas, mask_c


def _trace_ray_segmented(field_fn, occ_state, occ_cfg, cfg: RFTracerConfig,
                         rays: Rays, rng):
    """'ray' marching with segment-level coarse culling (see RFTracerConfig).

    With sufficient budgets the result matches the dense path exactly: only
    samples whose density would be zero (fine-unoccupied) or whose segment's
    dilated coarse cell is empty (implies fine-unoccupied) are skipped, and
    skipped samples contribute zero optical thickness either way.
    """
    G = cfg.segment_size
    ns = cfg.num_steps // G
    R = rays.origins.shape[0]
    depth, deltas, mask_c = coarse_segment_live(occ_state, occ_cfg, cfg,
                                                rays, rng)

    # compact live segments to the segment budget
    k_seg = cfg.seg_budget or max(1, 8 * cfg.max_samples // G)
    src_seg, seg_valid, _ = _stride_compact(mask_c.reshape(-1), k_seg)
    r_id = src_seg // ns
    depth_s = jnp.take(depth.reshape(R * ns, G), src_seg, axis=0)   # [K, G]
    delta_s = jnp.take(deltas.reshape(R * ns, G), src_seg, axis=0)  # [K, G]
    o_s = jnp.take(rays.origins, r_id, axis=0)
    d_s = jnp.take(rays.dirs, r_id, axis=0)
    samples_s = o_s[:, None, :] + d_s[:, None, :] * depth_s[..., None]
    fine = occ.query(occ_state, occ_cfg, samples_s) & seg_valid[:, None]

    # segment-major arrays over [k_seg, G]; segments ascend in (ray, depth)
    # order over the live prefix (stable compaction), as the compact
    # integration requires
    return dict(
        samples=samples_s,                                 # [k_seg, G, 3]
        dirs=jnp.broadcast_to(d_s[:, None, :], samples_s.shape),
        mask=fine,
        depth=depth_s,
        deltas=delta_s,
        ray=jnp.broadcast_to(r_id[:, None], (k_seg, G)),
        seg_valid=seg_valid)


def _trace_ray_deferred(occ_state, occ_cfg, cfg: RFTracerConfig, rays: Rays,
                        rng, fine_qfn):
    """Deferred-fine segmented march producing stage-2 segments directly.

    fine_mode='deferred': stage-1 liveness is the (conservative) coarse
    midpoint test, so stage-2's stride selection is pure index arithmetic on
    stage-1's compacted index list — segment data (depths, deltas, sample
    positions) is gathered ONCE at the eval_seg_budget (k2) granularity
    instead of materializing seg_budget (~5x more) rows first, and the
    per-sample fine query runs on the k2 survivors only.  Produces exactly
    the rows `_stage2_take(_trace_ray_segmented(...))` would
    (arrays[src_seg][sel] == arrays[src_seg[sel]])."""
    G = cfg.segment_size
    ns = cfg.num_steps // G
    R = rays.origins.shape[0]
    depth, deltas, mask_c = coarse_segment_live(occ_state, occ_cfg, cfg,
                                                rays, rng)
    k_seg = cfg.seg_budget or max(1, 8 * cfg.max_samples // G)
    src_seg, seg_valid, _ = _stride_compact(mask_c.reshape(-1), k_seg)
    k2 = cfg.eval_seg_budget
    n_live = jnp.sum(seg_valid)
    stride = jnp.maximum(1, -(-n_live // k2))
    sel = jnp.arange(k2, dtype=jnp.int32) * stride
    valid2 = sel < n_live
    src2 = jnp.take(src_seg, jnp.minimum(sel, k_seg - 1))   # flat seg ids
    r_id = src2 // ns
    depth2 = jnp.take(depth.reshape(R * ns, G), src2, axis=0)
    delta2 = jnp.take(deltas.reshape(R * ns, G), src2, axis=0)
    o2 = jnp.take(rays.origins, r_id, axis=0)
    d2 = jnp.take(rays.dirs, r_id, axis=0)
    samples2 = o2[:, None, :] + d2[:, None, :] * depth2[..., None]
    fine2 = fine_qfn(samples2) & valid2[:, None]
    return dict(
        samples=samples2,
        dirs=jnp.broadcast_to(d2[:, None, :], samples2.shape),
        fine=fine2,
        depth=depth2,
        deltas=delta2,
        ray=jnp.broadcast_to(r_id[:, None], (k2, G)),
        valid=valid2)


def _segment_liveness(occ_state, occ_cfg, cfg: RFTracerConfig, rays: Rays,
                      t_mid, dmin, dmax):
    """Coarse (+ transmittance) segment liveness from midpoint depths
    ``t_mid [R, ns]`` — the shared core of :func:`coarse_segment_live` and
    the lean stage-1."""
    ns = t_mid.shape[1]
    cover = segment_cover_radius(cfg, occ_cfg)
    rc = _coarse_res(cfg, occ_cfg)
    mid = rays.origins[:, None, :] + rays.dirs[:, None, :] * t_mid[..., None]
    inside = jnp.all(jnp.abs(mid) <= 1.0 + cover, axis=-1)
    ci = jnp.clip(jnp.floor((mid * 0.5 + 0.5) * rc), 0,
                  rc - 1).astype(jnp.int32)
    if cfg.term_tau > 0:
        packed = occ_state.get('coarse2')
        if packed is None:
            packed = coarse_packed_grid(occ_state, occ_cfg, cfg)
        v = packed[ci[..., 0], ci[..., 1], ci[..., 2]]        # [R, ns, 2]
        mask_c = (v[..., 0] > 0) & inside
        # estimated optical depth per live segment (see coarse_segment_live)
        G = cfg.segment_size
        S = cfg.num_steps
        seg_len = (dmax - dmin) * (G / (S - 1))               # [R, 1]
        tau = jnp.where(mask_c, v[..., 1] * seg_len, 0.0)
        cum = jnp.cumsum(tau, axis=-1) - tau                  # exclusive
        mask_c = mask_c & (cum <= cfg.term_tau)
    else:
        coarse = occ_state.get('coarse')
        if coarse is None:
            coarse = _coarse_dilated_occupancy(occ_state, occ_cfg, rc,
                                               cfg.seg_dilation)
        mask_c = coarse[ci[..., 0], ci[..., 1], ci[..., 2]] & inside
    return mask_c


def super_grid(occ_state, occ_cfg: occ.OccupancyGridConfig,
               cfg: RFTracerConfig):
    """Dilated occupancy for the super-segment midpoint test (two-level
    cull).  Trainers stash it as ``occ_state['super']`` once per prune."""
    return _coarse_dilated_occupancy(occ_state, occ_cfg,
                                     _coarse_res(cfg, occ_cfg),
                                     cfg.super_dilation)


def _lean_src2_two_level(occ_state, occ_cfg, cfg: RFTracerConfig,
                         rays: Rays, span, dmin):
    """Two-level lean stage-1: super-segment cull + sparse per-segment
    tests.  Returns (src2 [k2] flat segment ids, valid2 [k2]) in
    (ray, depth) order — identical survivors to the one-level test when
    budgets don't truncate."""
    G = cfg.segment_size
    S = cfg.num_steps
    ns = S // G
    F = cfg.super_factor
    assert ns % F == 0, (ns, F)   # validate_segment_cover enforces too
    ns_s = ns // F
    R = rays.origins.shape[0]
    k2 = cfg.eval_seg_budget
    rc = _coarse_res(cfg, occ_cfg)

    # --- super level: [R, ns_s] midpoint test on the dilated grid -------
    jmid_s = (jnp.arange(ns_s) * (F * G) + (F * G - 1) / 2.0) / (S - 1) \
        + 0.5 / S
    t_s = jmid_s[None, :] * span + dmin                       # [R, ns_s]
    mid_s = rays.origins[:, None, :] + rays.dirs[:, None, :] * t_s[..., None]
    cover_s = cfg.super_dilation * (2.0 / rc)
    inside_s = jnp.all(jnp.abs(mid_s) <= 1.0 + cover_s, axis=-1)
    sgrid = occ_state.get('super')
    if sgrid is None:
        sgrid = super_grid(occ_state, occ_cfg, cfg)
    ci_s = jnp.clip(jnp.floor((mid_s * 0.5 + 0.5) * rc), 0,
                    rc - 1).astype(jnp.int32)
    mask_s = sgrid[ci_s[..., 0], ci_s[..., 1], ci_s[..., 2]] & inside_s

    ks = k2                                    # super budget = the k2 rung
    src_s, valid_s, _ = _stride_compact(mask_s.reshape(-1), ks)
    r_s = src_s // ns_s
    si_s = src_s - r_s * ns_s                                 # [ks]

    # --- segment level on the ks*F sparse rows --------------------------
    si = si_s[:, None] * F + jnp.arange(F, dtype=jnp.int32)[None, :]
    seg_ids = r_s[:, None] * ns + si                          # [ks, F]
    span_s = jnp.take(span[:, 0], r_s)[:, None]
    dmin_s = jnp.take(dmin[:, 0], r_s)[:, None]
    t_mid = ((si * G + (G - 1) / 2.0) / (S - 1) + 0.5 / S) * span_s + dmin_s
    o_s = jnp.take(rays.origins, r_s, axis=0)[:, None, :]
    d_s = jnp.take(rays.dirs, r_s, axis=0)[:, None, :]
    mid = o_s + d_s * t_mid[..., None]                        # [ks, F, 3]
    cover = segment_cover_radius(cfg, occ_cfg)
    inside = jnp.all(jnp.abs(mid) <= 1.0 + cover, axis=-1)
    ci = jnp.clip(jnp.floor((mid * 0.5 + 0.5) * rc), 0,
                  rc - 1).astype(jnp.int32)
    if cfg.term_tau > 0:
        packed = occ_state.get('coarse2')
        if packed is None:
            packed = coarse_packed_grid(occ_state, occ_cfg, cfg)
        v = packed[ci[..., 0], ci[..., 1], ci[..., 2]]        # [ks, F, 2]
        mask_c = (v[..., 0] > 0) & inside & valid_s[:, None]
        seg_len = span_s * (G / (S - 1))
        tau = jnp.where(mask_c, v[..., 1] * seg_len, 0.0).reshape(-1)
        # exclusive per-RAY cumsum over the (ray, depth)-ordered rows;
        # super-dead segments contribute zero (their density cache is
        # below the prune threshold — same assumption as the dense path)
        rs_flat = jnp.repeat(r_s, F)
        ray_start = jnp.concatenate(
            [jnp.ones((1,), bool), rs_flat[1:] != rs_flat[:-1]])
        cum = _segmented_cumsum_excl(tau, ray_start)
        mask_c = mask_c & (cum.reshape(ks, F) <= cfg.term_tau)
    else:
        coarse = occ_state.get('coarse')
        if coarse is None:
            coarse = _coarse_dilated_occupancy(occ_state, occ_cfg, rc,
                                               cfg.seg_dilation)
        mask_c = (coarse[ci[..., 0], ci[..., 1], ci[..., 2]]
                  & inside & valid_s[:, None])

    sel, valid2, _ = _stride_compact(mask_c.reshape(-1), k2)
    src2 = jnp.take(seg_ids.reshape(-1), sel)
    return src2, valid2


def _trace_ray_deferred_lean(occ_state, occ_cfg, cfg: RFTracerConfig,
                             rays: Rays, rng, fine_qfn):
    """Lean deferred-fine march (``cfg.lean_stage1``): stage-1 touches only
    [R, ns] midpoint arrays (no [R, S] ladders), compacts directly to the
    eval budget, and stage-2 recomputes depths/deltas for the k2 survivors
    from segment ids + counter-hash jitter (see RFTracerConfig.lean_stage1).

    Sampling law: dense depth_j = (j/(S-1) + u_j/S)*span + dmin (the
    reference formula, octree_as.py:252-259) with u_j = hash(seed, sample
    uid); deltas are the uniform span/(S-1) quadrature."""
    G = cfg.segment_size
    S = cfg.num_steps
    ns = S // G
    R = rays.origins.shape[0]
    seed = _lean_seed(rng)
    dmin = jnp.broadcast_to(rays.dist_min, (R,))[:, None]
    dmax = jnp.broadcast_to(rays.dist_max, (R,))[:, None]
    span = dmax - dmin                                        # [R, 1]

    k2 = cfg.eval_seg_budget
    if cfg.super_factor > 1:
        src2, valid2 = _lean_src2_two_level(occ_state, occ_cfg, cfg, rays,
                                            span, dmin)
    else:
        # analytic segment midpoints: center sample index + expected jitter
        jmid = (jnp.arange(ns) * G + (G - 1) / 2.0) / (S - 1) + 0.5 / S
        t_mid = jmid[None, :] * span + dmin                   # [R, ns]
        mask_c = _segment_liveness(occ_state, occ_cfg, cfg, rays, t_mid,
                                   dmin, dmax)
        src2, valid2, _ = _stride_compact(mask_c.reshape(-1), k2)
    r_id = src2 // ns
    si = src2 - r_id * ns                                     # segment in ray
    j = si[:, None] * G + jnp.arange(G, dtype=jnp.int32)[None, :]  # [k2, G]
    u2 = _hash01(seed, src2[:, None] * G
                 + jnp.arange(G, dtype=jnp.int32)[None, :])
    span_r = jnp.take(span[:, 0], r_id)[:, None]              # [k2, 1]
    dmin_r = jnp.take(dmin[:, 0], r_id)[:, None]
    depth2 = (j.astype(jnp.float32) / (S - 1) + u2 / S) * span_r + dmin_r
    delta2 = jnp.broadcast_to(span_r / (S - 1), (k2, G))
    o2 = jnp.take(rays.origins, r_id, axis=0)
    d2 = jnp.take(rays.dirs, r_id, axis=0)
    samples2 = o2[:, None, :] + d2[:, None, :] * depth2[..., None]
    fine2 = fine_qfn(samples2) & valid2[:, None]
    return dict(
        samples=samples2,
        dirs=jnp.broadcast_to(d2[:, None, :], samples2.shape),
        fine=fine2,
        depth=depth2,
        deltas=delta2,
        ray=jnp.broadcast_to(r_id[:, None], (k2, G)),
        valid=valid2)


def crossing_term_mask(occ_state, occ_cfg, entries, exits, valid, rays,
                       u_mid, S: int, term_tau: float):
    """Transmittance culling on DDA crossings — :func:`voxel_term_mask`
    without the ``[R, I*S]`` sample tensors (the fused voxel trace never
    materializes them).  Same estimate: cached decayed-max density x
    in-cell chord, exclusive-cumsum'd front-to-back; the cell 'midpoint'
    is sample index S//2 of the SAME jitter draw, so the kept set matches
    :func:`voxel_term_mask` bit-for-bit."""
    chord = (exits - entries) * valid
    depth_mid = entries + (exits - entries) * ((S // 2) + u_mid) / S
    mid = (rays.origins[:, None, :]
           + rays.dirs[:, None, :] * depth_mid[..., None])
    res = occ_cfg.res
    ci = jnp.clip(jnp.floor((mid * 0.5 + 0.5) * res),
                  0, res - 1).astype(jnp.int32)
    dens = occ_state['density'][ci[..., 0], ci[..., 1], ci[..., 2]]
    tau = dens * chord
    cum = jnp.cumsum(tau, axis=-1) - tau                      # exclusive
    return cum <= term_tau


def _trace_voxel_fused(occ_state, occ_cfg, cfg: RFTracerConfig, rays: Rays,
                       rng):
    """Fused voxel stage-2: compact DDA crossings to the eval budget FIRST,
    then sample num_steps points only inside the surviving cells.

    Produces exactly the ``seg2`` rows the materialize-then-take path
    (raymarch_voxel -> [R, I*S] tensors -> _stage2_take) would — same
    jitter rows, same stride compaction on the same flat (ray, crossing)
    axis — without ever building the [R, I, S] sample/depth/delta tensors
    (their stage-2 gather was the top remaining voxel cost after the DDA
    rework, docs/ROOFLINE.md)."""
    R = rays.origins.shape[0]
    I, S = cfg.max_intersections, cfg.num_steps
    c = occ.voxel_crossings(occ_state, occ_cfg, rays, I)
    entries, exits, valid = c['entries'], c['exits'], c['valid']
    u = occ.march_uniform(rng, (R, I, S))
    if cfg.term_tau > 0:
        valid = valid & crossing_term_mask(
            occ_state, occ_cfg, entries, exits, valid, rays,
            u[..., S // 2], S, cfg.term_tau)
    k2 = cfg.eval_seg_budget
    src2, valid2, _ = _stride_compact(valid.reshape(-1), k2)
    r_id = src2 // I
    ent2 = jnp.take(entries.reshape(-1), src2)
    ext2 = jnp.take(exits.reshape(-1), src2)
    u2 = jnp.take(u.reshape(R * I, S), src2, axis=0)
    frac = (jnp.arange(S) + u2) / S
    depth2 = ent2[:, None] + (ext2 - ent2)[:, None] * frac
    delta2 = jnp.broadcast_to(((ext2 - ent2) / S)[:, None], (k2, S))
    o2 = jnp.take(rays.origins, r_id, axis=0)
    d2 = jnp.take(rays.dirs, r_id, axis=0)
    samples2 = o2[:, None, :] + d2[:, None, :] * depth2[..., None]
    return dict(
        samples=samples2,
        dirs=jnp.broadcast_to(d2[:, None, :], samples2.shape),
        fine=jnp.broadcast_to(valid2[:, None], (k2, S)),
        depth=depth2,
        deltas=delta2,
        ray=jnp.broadcast_to(r_id[:, None], (k2, S)),
        valid=valid2)


def voxel_term_mask(occ_state, occ_cfg, m, R: int, I: int, S: int,
                    term_tau: float):
    """Transmittance culling over DDA cell intersections: ``[R, I]`` bool,
    True while the estimated transmittance at the cell's entry is above
    exp(-term_tau).  Intersections are depth-ordered per ray (the DDA walks
    front-to-back), so the per-cell optical-depth estimate — cached
    decayed-max density x in-cell chord length — accumulates with an
    exclusive cumsum along the intersection axis.  Padding intersections
    (mask all-False) contribute zero."""
    samples = m['samples'].reshape(R, I, S, 3)
    deltas = m['deltas'].reshape(R, I, S)
    mask = m['mask'].reshape(R, I, S)
    chord = jnp.sum(deltas * mask, axis=-1)                   # [R, I]
    mid = samples[:, :, S // 2, :]
    res = occ_cfg.res
    ci = jnp.clip(jnp.floor((mid * 0.5 + 0.5) * res),
                  0, res - 1).astype(jnp.int32)
    dens = occ_state['density'][ci[..., 0], ci[..., 1], ci[..., 2]]
    tau = dens * chord
    cum = jnp.cumsum(tau, axis=-1) - tau                      # exclusive
    return cum <= term_tau


def _flatten_segs(seg):
    return dict(
        samples=seg['samples'].reshape(-1, 3),
        dirs=seg['dirs'].reshape(-1, 3),
        mask=seg['mask'].reshape(-1),
        depth=seg['depth'].reshape(-1),
        deltas=seg['deltas'].reshape(-1),
        ray=seg['ray'].reshape(-1))


def _stage2_take(seg, cfg: RFTracerConfig, fine_qfn=None):
    """Second-stage segment compaction: keep (up to) ``eval_seg_budget``
    live segments and gather their per-segment data.

    With ``fine_qfn`` (fine_mode='deferred'), ``seg['mask']`` is the
    broadcast coarse liveness: stage-1 already compacted live segments into
    a stable-ordered prefix, so stage-2 compaction is a strided gather of
    that prefix (equal to _stride_compact on a prefix mask, minus its
    cumsum + scatter), and the per-sample fine mask is queried here on the
    eval_seg_budget survivors only."""
    g = seg['samples'].shape[1]
    k2 = cfg.eval_seg_budget
    if fine_qfn is not None:
        n_live = jnp.sum(seg['seg_valid'])
        stride = jnp.maximum(1, -(-n_live // k2))
        src2 = jnp.arange(k2, dtype=jnp.int32) * stride
        valid2 = src2 < n_live
        src2 = jnp.minimum(src2, seg['seg_valid'].shape[0] - 1)
    else:
        live = seg['mask'].any(axis=-1)
        src2, valid2, _ = _stride_compact(live, k2)
    take = lambda a: jnp.take(a.reshape(a.shape[0], -1), src2,
                              axis=0)
    samples2 = take(seg['samples']).reshape(k2, g, 3)
    if fine_qfn is not None:
        fine2 = fine_qfn(samples2) & valid2[:, None]
    else:
        fine2 = take(seg['mask']).reshape(k2, g) & valid2[:, None]
    return dict(
        samples=samples2,
        dirs=take(seg['dirs']).reshape(k2, g, 3),
        fine=fine2,
        depth=take(seg['depth']).reshape(k2, g),
        deltas=take(seg['deltas']).reshape(k2, g),
        ray=take(seg['ray']).reshape(k2, g),
        valid=valid2)


def _trace_paged(encode_fn, head_fn, seg2, cfg: RFTracerConfig,
                 num_rays: int, finish_fn=None, dil_qfn=None):
    """Segment-grouped paged trace over stage-2-compacted segments:
    coarse-cell grouping, paged grid encode on all segment rows, then
    row-level compaction for the MLP head and compact integration.

    With ``finish_fn`` (the deferred-direct split), ``encode_fn`` returns
    only the paged LODs' narrow latents and ``finish_fn(zbar_c, coords_c)``
    completes the features on the compacted rows.

    With ``dil_qfn`` (fine_mode='kernel'), ``seg2['fine']`` is only the
    coarse liveness; grouping uses the dilated sub-segment midpoint test
    and ``encode_fn`` returns ``(zbar, occ [N])`` — the in-kernel
    per-sample fine occupancy — which gates the row compaction."""
    from shacira_tpu.ops import paged_hash as ph

    samples2, fine2, valid2 = seg2['samples'], seg2['fine'], seg2['valid']
    dirs2, depth2, delta2, ray2 = (seg2['dirs'], seg2['depth'],
                                   seg2['deltas'], seg2['ray'])
    k2, g = samples2.shape[0], samples2.shape[1]
    spb = cfg.group_segs_per_block
    occ_mode = dil_qfn is not None

    # group at sub-segment granularity (gss samples; see group_seg_size)
    gss = cfg.group_seg_size or g
    n_sub = k2 * (g // gss)
    sub_samples = samples2.reshape(n_sub, gss, 3)
    centers01 = sub_samples[:, gss // 2, :] * 0.5 + 0.5
    # fully fine-dead sub-segments never reach the head (all their rows
    # carry zero optical thickness), so drop them from the grouping too —
    # they then occupy no kernel blocks (pad-block skip) and the encode
    # cost tracks the fine-live volume, not the coarse-live one
    if occ_mode:
        fine_sub = dil_qfn(sub_samples[:, gss // 2, :])
    else:
        fine_sub = fine2.reshape(n_sub, gss).any(axis=-1)
    valid_sub = jnp.repeat(valid2, g // gss) & fine_sub
    n_blocks = n_sub // spb + cfg.group_res ** 3
    grouping = ph.group_segments(centers01, valid_sub, spb, n_blocks,
                                 cfg.group_res)

    if occ_mode:
        assert finish_fn is not None, \
            "fine_mode='kernel' needs the deferred-direct encode split"
        zbar, occ_flat = encode_fn(samples2.reshape(k2 * g, 3), grouping)
        fine2 = (occ_flat.reshape(k2, g) > 0.5) & valid2[:, None]
        src_idx, k_valid, inv_idx = _stride_compact(fine2.reshape(-1),
                                                    cfg.max_samples)
        zbar_c = ph.permute_rows(zbar, src_idx, inv_idx, cfg.max_samples)
        coords_c = jnp.take(samples2.reshape(-1, 3), src_idx, axis=0)
        feats_c = finish_fn(zbar_c, coords_c)
    else:
        src_idx, k_valid, inv_idx = _stride_compact(fine2.reshape(-1),
                                                    cfg.max_samples)
        if finish_fn is not None:
            # deferred-direct split: paged LODs encode on the segment rows
            # (they need the grouping); the narrow zbar is compacted via a
            # mutual-inverse permutation (gather backward), and the direct
            # LODs encode only on the max_samples surviving rows
            zbar = encode_fn(samples2.reshape(k2 * g, 3), grouping)
            zbar_c = ph.permute_rows(zbar, src_idx, inv_idx, cfg.max_samples)
            coords_c = jnp.take(samples2.reshape(-1, 3), src_idx, axis=0)
            feats_c = finish_fn(zbar_c, coords_c)
        else:
            feats = encode_fn(samples2.reshape(k2 * g, 3), grouping)
            # feats is the only param-path input here: route its backward
            # through a gather instead of an XLA row-scatter
            feats_c = ph.permute_rows(feats, src_idx, inv_idx,
                                      cfg.max_samples)
    color, density = head_fn(feats_c,
                             jnp.take(dirs2.reshape(-1, 3), src_idx, axis=0))
    return volume_integrate_compact(
        color, density[..., 0], jnp.take(delta2.reshape(-1), src_idx),
        jnp.take(depth2.reshape(-1), src_idx), k_valid,
        jnp.take(ray2.reshape(-1), src_idx), num_rays)


def trace(field_fn, occ_state, occ_cfg: occ.OccupancyGridConfig,
          cfg: RFTracerConfig, rays: Rays, rng, encode_split=None):
    """Render rays against a radiance field.

    Args:
        field_fn: (coords [...,3], ray_d [...,3]) -> (rgb [...,3], density [...,1]).
        occ_state/occ_cfg: dense occupancy grid.
        rays: [R] rays.
        rng: key for raymarch jitter.
        encode_split: optional pair/triple enabling the paged trace
            (cfg.eval_seg_budget > 0).  Pair: (encode_fn, head_fn) with
            encode_fn(coords [K*G, 3], grouping) -> feats and
            head_fn(feats, dirs) -> (rgb, density).  Triple (deferred-direct
            split): (zbar_fn, finish_fn, head_fn) where zbar_fn returns only
            the paged LODs' latents on the segment rows and
            finish_fn(zbar_c, coords_c) completes features on the compacted
            rows (direct-LOD encode touches max_samples rows only).
    Returns:
        dict with rgb [R,3], alpha [R,1], depth [R,1], hit [R] (RenderBuffer
        equivalent of the reference, packed_rf_tracer.py:170), plus one
        volume-integrated [R,k] buffer per extra channel the field returns
        (ref extra-channel integration, packed_rf_tracer.py:155-168).
    """
    R = rays.origins.shape[0]
    if (cfg.fine_mode == 'kernel' and encode_split is not None
            and len(encode_split) != 3):
        raise ValueError(
            "fine_mode='kernel' requires the 3-way encode_split "
            "(zbar_fn, finish_fn, head_fn); a 2-tuple would silently skip "
            "the in-kernel fine occupancy query")
    if (cfg.raymarch_type == 'voxel' and encode_split is not None
            and cfg.eval_seg_budget > 0 and cfg.max_samples > 0):
        # paged voxel trace: each (ray, intersected-cell) group of num_steps
        # samples lies inside ONE occupancy cell, and occupancy cells nest
        # exactly inside the paged kernels' grouping cells (both power-of-2
        # grids) — so the DDA's intersection axis IS the segment axis, with
        # no coarse culling or fine query needed (live cells are occupied
        # by construction).  Fused stage-2: crossings compact to the eval
        # budget before any per-sample tensor exists.
        seg2 = _trace_voxel_fused(occ_state, occ_cfg, cfg, rays, rng)
        if len(encode_split) == 3:
            out = _trace_paged(encode_split[0], encode_split[2], seg2, cfg, R,
                               finish_fn=encode_split[1])
        else:
            out = _trace_paged(encode_split[0], encode_split[1], seg2, cfg, R)
    elif (cfg.raymarch_type == 'ray' and cfg.segment_size > 0
            and cfg.max_samples > 0):
        paged = encode_split is not None and cfg.eval_seg_budget > 0
        if paged:
            dil_qfn = None
            if cfg.fine_mode == 'kernel':
                # the real per-sample fine mask comes out of the encode
                # kernels; here only the (conservative) coarse liveness
                dil = occ_state['fine_dil']

                def dil_qfn(pts):
                    rc = occ_cfg.res
                    ci = jnp.clip(jnp.floor((pts * 0.5 + 0.5) * rc),
                                  0, rc - 1).astype(jnp.int32)
                    return dil[ci[..., 0], ci[..., 1], ci[..., 2]]

                kernel_deferred = (_trace_ray_deferred_lean
                                   if cfg.lean_stage1 else
                                   _trace_ray_deferred)
                seg2 = kernel_deferred(
                    occ_state, occ_cfg, cfg, rays, rng,
                    lambda s: jnp.ones(s.shape[:-1], bool))
            elif cfg.fine_mode == 'deferred':
                deferred = (_trace_ray_deferred_lean if cfg.lean_stage1
                            else _trace_ray_deferred)
                seg2 = deferred(
                    occ_state, occ_cfg, cfg, rays, rng,
                    lambda s: occ.query(occ_state, occ_cfg, s))
            else:
                seg = _trace_ray_segmented(field_fn, occ_state, occ_cfg,
                                           cfg, rays, rng)
                seg2 = _stage2_take(seg, cfg)
            if len(encode_split) == 3:      # (zbar_fn, finish_fn, head_fn)
                out = _trace_paged(encode_split[0], encode_split[2], seg2,
                                   cfg, R, finish_fn=encode_split[1],
                                   dil_qfn=dil_qfn)
            else:
                out = _trace_paged(encode_split[0], encode_split[1], seg2,
                                   cfg, R)
        else:
            seg = _trace_ray_segmented(field_fn, occ_state, occ_cfg, cfg,
                                       rays, rng)
            out = _trace_compact_flat(field_fn, _flatten_segs(seg),
                                      cfg.max_samples, R)
    else:
        if cfg.raymarch_type == 'ray':
            m = occ.raymarch_ray(occ_state, occ_cfg, rays, cfg.num_steps, rng)
        elif cfg.raymarch_type == 'voxel':
            m = occ.raymarch_voxel(occ_state, occ_cfg, rays, cfg.num_steps,
                                   rng, cfg.max_intersections)
            if cfg.term_tau > 0:
                I, S = cfg.max_intersections, cfg.num_steps
                keep = voxel_term_mask(occ_state, occ_cfg, m, R, I, S,
                                       cfg.term_tau)
                m = dict(m, mask=(m['mask'].reshape(R, I, S)
                                  & keep[..., None]).reshape(m['mask'].shape))
        else:
            raise ValueError(cfg.raymarch_type)

        samples, mask = m['samples'], m['mask']
        S = mask.shape[1]
        if cfg.max_samples and cfg.max_samples < R * S:
            flat = dict(
                samples=samples.reshape(-1, 3),
                dirs=jnp.broadcast_to(rays.dirs[:, None, :],
                                      (R, S, 3)).reshape(-1, 3),
                mask=mask.reshape(-1),
                depth=m['depth'].reshape(-1),
                deltas=m['deltas'].reshape(-1),
                ray=jnp.broadcast_to(
                    jnp.arange(R, dtype=jnp.int32)[:, None],
                    (R, S)).reshape(-1))
            out = _trace_compact_flat(field_fn, flat, cfg.max_samples, R)
        else:
            dirs = jnp.broadcast_to(rays.dirs[:, None, :], samples.shape)
            color, density, extras = _eval_field(field_fn, samples, dirs)
            density = density[..., 0]
            color = jnp.where(mask[..., None], color, 0.0)
            density = jnp.where(mask, density, 0.0)
            extras = {k: jnp.where(mask[..., None], v, 0.0)
                      for k, v in extras.items()}
            rgb, alpha, depth = volume_integrate(color, density, m['deltas'],
                                                 m['depth'], mask)
            out = {'rgb': rgb, 'alpha': alpha, 'depth': depth}
            if extras:
                w = integration_weights(density, m['deltas'], mask)
                for name, v in extras.items():
                    out[name] = jnp.sum(w[..., None] * v, axis=-2)

    alpha = out['alpha']
    out['hit'] = alpha[..., 0] > 0.0
    if cfg.bg_color == 'white':
        out['rgb'] = (1.0 - alpha) + out['rgb']
    else:
        out['rgb'] = alpha * out['rgb']  # reference (packed_rf_tracer.py:152)
    return out


def _trace_compact_flat(field_fn, flat, max_samples: int, num_rays: int):
    """Evaluate + integrate flat candidate rows fully in compact form."""
    src_idx, valid, color, density, extras = _compact_eval_rows(
        field_fn, flat['samples'], flat['dirs'], flat['mask'], max_samples)
    return volume_integrate_compact(
        color, density, flat['deltas'][src_idx], flat['depth'][src_idx],
        valid, flat['ray'][src_idx], num_rays, extras)
