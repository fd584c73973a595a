"""Dense occupancy grid — the TPU-native acceleration structure.

Replaces the reference's kaolin SPC octree BLAS (``wisp/accelstructs/
octree_as.py``).  The SHACIRA/NGP NeRF path only ever uses a *dense-then-
pruned* octree at a fixed ``blas_level`` (``latent_grid.py:70`` +
``nerf.py:150-185``), which on TPU maps perfectly onto a dense boolean
occupancy volume of ``(2**level)**3`` cells:

* shapes are static — pruning only flips mask *values*, never tensor shapes
  (the reference rebuilds the octree and changes sample counts per ray);
* queries are O(1) gathers, raymarch is a fixed-step masked program;
* the NGP-style pruning update (density decay + max, ``nerf.py:150-185``)
  is a pure functional update of the occupancy values.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from shacira_tpu.core.rays import Rays


@dataclass(frozen=True)
class OccupancyGridConfig:
    level: int = 7                 # blas_level; grid res = 2**level per axis

    @property
    def res(self) -> int:
        return 2 ** self.level

    @property
    def num_cells(self) -> int:
        return self.res ** 3


def occupancy_init(cfg: OccupancyGridConfig, occupied: bool = True):
    """State dict: 'density' tracks decayed max density per cell
    (ref grid.occupancy, latent_grid.py:76), 'occ' is the boolean mask."""
    res = cfg.res
    return {
        'density': jnp.zeros((res, res, res), jnp.float32),
        'occ': jnp.full((res, res, res), occupied, dtype=bool),
    }


def occupancy_from_points(cfg: OccupancyGridConfig, points, dilate: int = 1):
    """Occupancy state seeded from a [-1,1]^3 pointcloud (+ dilation).

    The reference pre-builds the RTMV octree from the depth pointcloud
    (rtmv_dataset 'supports_depth' + OctreeAS.from_pointcloud) so
    raymarching only ever visits the captured surface; the dense-grid
    analog marks the cells containing points and max-dilates.  Tracked
    densities start at zero, and prune_update keeps the previous occupancy
    when nothing clears the threshold, so the seed persists until the
    field's density forms.
    """
    import numpy as np
    res = cfg.res
    idx = np.clip(((np.asarray(points) * 0.5 + 0.5) * res), 0,
                  res - 1e-5).astype(np.int64)
    occ = np.zeros((res, res, res), bool)
    occ[idx[:, 0], idx[:, 1], idx[:, 2]] = True

    @jax.jit
    def build(o):
        if dilate > 0:
            k = 2 * dilate + 1
            u = o.astype(jnp.uint8)
            for axis in range(3):      # separable 3D max filter
                win = [1, 1, 1]
                win[axis] = k
                u = jax.lax.reduce_window(u, np.uint8(0), jax.lax.max,
                                          tuple(win), (1, 1, 1), 'SAME')
            o = u.astype(bool)
        return {'density': jnp.zeros((res, res, res), jnp.float32), 'occ': o}

    return build(jnp.asarray(occ))


def cell_index(cfg: OccupancyGridConfig, coords):
    """[-1,1]^3 coords -> integer cell ids [..., 3] (clamped)."""
    res = cfg.res
    x = jnp.clip((coords * 0.5 + 0.5) * res, 0, res - 1e-5)
    return jnp.floor(x).astype(jnp.int32)


def query(state, cfg: OccupancyGridConfig, coords):
    """bool occupancy at [-1,1]^3 coords; False outside the unit cube.

    Mirrors OctreeAS.query's pidx > -1 semantics (octree_as.py:266-269).
    """
    idx = cell_index(cfg, coords)
    inside = jnp.all((coords >= -1.0) & (coords <= 1.0), axis=-1)
    occ = state['occ'][idx[..., 0], idx[..., 1], idx[..., 2]]
    return occ & inside


def prune_update(state, cfg: OccupancyGridConfig, density, *,
                 density_decay: float, min_density: float):
    """NGP pruning step (ref NeuralRadianceField.prune, nerf.py:150-185).

    Args:
        density: [num_cells] density sampled at one jittered point per cell
            (cell-major raster order: x-major like meshgrid indexing='ij').
    Returns:
        new state with decayed+maxed density and thresholded occupancy.
    """
    res = cfg.res
    d = state['density'] * density_decay
    d = jnp.maximum(d, density.reshape(res, res, res))
    occ_new = d > min_density
    # if nothing survives, keep the previous occupancy (ref nerf.py:175-176)
    occ_new = jnp.where(jnp.any(occ_new), occ_new, state['occ'])
    return {'density': d, 'occ': occ_new}


def march_uniform(rng, shape):
    """Jitter source for the raymarchers: either a PRNG key (drawn here) or
    a pre-drawn U(0,1) array of exactly ``shape``.

    shard_map'd traces (``rf_tracer`` sharded over the ray axis) draw ONE
    bulk uniform outside the manual region and pass per-device row slices
    in, so every device jitters its own rays without per-device key
    plumbing — and the sharded trace samples the exact same points as the
    single-device one (the equivalence tests rely on this).
    """
    if hasattr(rng, 'ndim') and rng.ndim >= 2:
        if tuple(rng.shape) != tuple(shape):
            raise ValueError(
                f'pre-drawn march jitter shape {rng.shape} != {shape}')
        return rng
    return jax.random.uniform(rng, shape)


def cell_centers_jittered(cfg: OccupancyGridConfig, rng):
    """One uniform sample inside every cell, in [-1,1]^3 (ref nerf.py:160-165)."""
    res = cfg.res
    ii = jnp.stack(jnp.meshgrid(jnp.arange(res), jnp.arange(res), jnp.arange(res),
                                indexing='ij'), axis=-1).reshape(-1, 3)
    u = jax.random.uniform(rng, ii.shape)
    return ((ii + u) / res) * 2.0 - 1.0


def raymarch_ray(state, cfg: OccupancyGridConfig, rays: Rays, num_steps: int,
                 rng):
    """'ray' raymarching: fixed jittered samples + occupancy mask.

    Fixed-shape re-design of OctreeAS._raymarch_ray (octree_as.py:229-290):
    the reference samples ``num_steps`` per ray, queries the octree and
    *filters* misses into a packed tensor; we keep the dense [R, S] layout
    with a boolean mask (masked samples contribute zero optical thickness —
    mathematically identical to packing).

    Sampling matches the reference exactly (octree_as.py:252-259):
    ``depth = linspace(0,1,S) + U(0,1)/S``, scaled to [dist_min, dist_max];
    ``deltas = diff(depth, prepend=dist_min)``.

    Returns dict with:
        samples [R, S, 3], depth [R, S], deltas [R, S], mask [R, S] bool.
    """
    R = rays.origins.shape[0]
    base = jnp.linspace(0.0, 1.0, num_steps)
    jitter = march_uniform(rng, (R, num_steps)) / num_steps
    t = base[None, :] + jitter
    dmin = jnp.broadcast_to(rays.dist_min, (R,))[:, None]
    dmax = jnp.broadcast_to(rays.dist_max, (R,))[:, None]
    depth = t * (dmax - dmin) + dmin                      # [R, S]
    samples = rays.origins[:, None, :] + rays.dirs[:, None, :] * depth[..., None]
    mask = query(state, cfg, samples)
    deltas = jnp.diff(depth, axis=-1, prepend=dmin)
    return {'samples': samples, 'depth': depth, 'deltas': deltas, 'mask': mask}


def voxel_crossings(state, cfg: OccupancyGridConfig, rays: Rays,
                    max_intersections: int = 64):
    """Occupied-cell crossings of the bounded DDA: dict with
    ``entries [R, I]``, ``exits [R, I]``, ``valid [R, I]`` bool —
    depth-ordered per ray (the DDA walks front-to-back).

    This is the cheap half of :func:`raymarch_voxel`; the paged voxel
    trace consumes crossings directly and samples only the
    eval-budget survivors (fused stage-2), never materializing the
    [R, I*num_steps] sample tensors."""
    R = rays.origins.shape[0]
    res = cfg.res
    o, d = rays.origins, rays.dirs
    safe_d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)

    # ray/unit-cube intersection
    t0 = (-1.0 - o) / safe_d
    t1 = (1.0 - o) / safe_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tmin = jnp.maximum(tmin, jnp.broadcast_to(rays.dist_min, (R,)))
    tmax = jnp.minimum(tmax, jnp.broadcast_to(rays.dist_max, (R,)))
    hit_box = tmax > tmin

    cell_w = 2.0 / res

    # DDA with a SCALAR scan carry: each step records (entry t, exit t,
    # occupied) POSITIONALLY into the scan's stacked outputs; occupied
    # crossings then compact into the [R, max_intersections] slot layout
    # with one batched scatter.  (A carried [R, I] pair updated with
    # .at[count].set lowers under vmap to a one-hot select over all I
    # slots per DDA step — ~R*I*steps VPU ops — and dominated the voxel
    # path's wall.)
    def per_ray(o_r, d_r, tmin_r, tmax_r):
        eps = 1e-6

        def body(t, _):
            p = o_r + d_r * (t + eps)
            idx = jnp.floor((p * 0.5 + 0.5) * res).astype(jnp.int32)
            inside = jnp.all((idx >= 0) & (idx < res)) & (t < tmax_r)
            idxc = jnp.clip(idx, 0, res - 1)
            # exit t of current cell along each axis
            bounds = (idxc + (d_r > 0)) * cell_w - 1.0
            t_exit = jnp.min((bounds - o_r)
                             / jnp.where(jnp.abs(d_r) < 1e-9, 1e-9, d_r))
            t_exit = jnp.maximum(t_exit, t + eps)
            occ = state['occ'][idxc[0], idxc[1], idxc[2]] & inside
            return t_exit, (t, jnp.minimum(t_exit, tmax_r), occ)

        n_cells_max = 3 * res + 2
        # the scan is fixed-overhead-bound (386 sequential steps of one
        # [R]-row gather each at res 128); unrolling amortizes the
        # per-step bookkeeping ~8x
        _, (t_ent, t_exi, occ_l) = jax.lax.scan(
            body, tmin_r, None, length=n_cells_max, unroll=8)
        return t_ent, t_exi, occ_l                        # [L] each

    t_ent, t_exi, occ_l = jax.vmap(per_ray)(o, d, tmin, tmax)  # [R, L]
    occ_l = occ_l & hit_box[:, None]
    rank = jnp.cumsum(occ_l.astype(jnp.int32), axis=1) - 1     # live rank
    kept = occ_l & (rank < max_intersections)
    slot = jnp.where(kept, rank, max_intersections)            # pad column
    r_iota = jnp.broadcast_to(
        jnp.arange(R, dtype=jnp.int32)[:, None], slot.shape)
    flat = (r_iota * (max_intersections + 1) + slot).reshape(-1)
    shape_p = (R * (max_intersections + 1),)
    entries = jnp.zeros(shape_p).at[flat].set(t_ent.reshape(-1))
    exits = jnp.zeros(shape_p).at[flat].set(t_exi.reshape(-1))
    entries = entries.reshape(R, max_intersections + 1)[:, :-1]
    exits = exits.reshape(R, max_intersections + 1)[:, :-1]
    count = jnp.sum(kept, axis=1)                              # [R]
    ivalid = (jnp.arange(max_intersections)[None, :] < count[:, None])
    return {'entries': entries, 'exits': exits, 'valid': ivalid}


def raymarch_voxel(state, cfg: OccupancyGridConfig, rays: Rays,
                   num_steps: int, rng, max_intersections: int = 64):
    """'voxel' raymarching via fixed-step DDA along each ray.

    Fixed-shape re-design of OctreeAS._raymarch_voxel (octree_as.py:171-227):
    instead of the kaolin raytrace kernel's variable intersection list, we
    march the ray through the occupancy volume with a bounded DDA
    (``max_intersections`` occupied-cell hits per ray), then draw
    ``num_steps`` uniformly spaced samples inside each hit cell interval.

    Returns the same dict layout as :func:`raymarch_ray` with
    S = max_intersections * num_steps.
    """
    R = rays.origins.shape[0]
    o, d = rays.origins, rays.dirs
    c = voxel_crossings(state, cfg, rays, max_intersections)
    entries, exits, ivalid = c['entries'], c['exits'], c['valid']
    # sample num_steps per interval (ref sample_from_depth_intervals)
    u = march_uniform(rng, (R, max_intersections, num_steps))
    frac = (jnp.arange(num_steps) + u) / num_steps
    depth = entries[..., None] + (exits - entries)[..., None] * frac  # [R, I, S]
    depth = depth.reshape(R, -1)
    step_w = ((exits - entries) / num_steps)
    deltas = jnp.repeat(step_w, num_steps, axis=-1).reshape(R, -1)
    mask = jnp.repeat(ivalid, num_steps, axis=-1).reshape(R, -1)
    samples = o[:, None, :] + d[:, None, :] * depth[..., None]
    return {'samples': samples, 'depth': depth, 'deltas': deltas, 'mask': mask}
