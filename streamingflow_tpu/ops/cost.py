"""Trajectory cost library for the planning head (BEV raster costs).

TPU-native re-design of the reference cost aggregation
(streamingflow/cost.py: Cost_Function:10-47, BaseCost helpers :50-155,
Cost_Volume:157, Rule:173, SafetyCost:201, HeadwayCost:234, LR_divider:264,
Comfort:307, Progress:372).

Design differences from the reference (all jit-friendly, static shapes):

* The ego-box polygon footprint (reference ``get_origin_points`` via
  skimage.draw.polygon) is rasterised once on the host with a pure-numpy
  half-plane test and padded to a static cell count; sampling BEV rasters
  along trajectories becomes one batched gather.
* Every per-timestep Python loop (velocities, accelerations, jerk) is a
  vectorised ``diff`` along the time axis.
* ``LR_divider``'s data-dependent loop over nonzero lane pixels becomes a
  chunked ``lax.scan`` running-min over *all* grid cells with non-lane
  cells masked to +inf — exact, static-shape, and MXU/VPU friendly.

Conventions: all rasters are (B, T, H, W); trajectories are ego-frame
metres (B, N, T, 2) with the reference's (x, y) order — the caller flips x
(``trajs * [-1, 1]``) exactly like cost.py:35 before handing them here.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- host-side geo
def polygon_fill(pts: np.ndarray) -> np.ndarray:
    """All integer (row, col) cells inside a convex polygon.

    Pure-numpy replacement for skimage.draw.polygon as used at reference
    cost.py:81 (only ever called with the convex ego-box quad).  Uses the
    same half-open scanline convention: a cell (r, c) is inside when the
    point (r, c) lies within the polygon boundary (edges inclusive)."""
    pts = np.asarray(pts, np.float64)  # (K, 2) as (row, col)
    rmin, rmax = int(np.floor(pts[:, 0].min())), int(np.ceil(pts[:, 0].max()))
    cmin, cmax = int(np.floor(pts[:, 1].min())), int(np.ceil(pts[:, 1].max()))
    rr, cc = np.meshgrid(np.arange(rmin, rmax + 1), np.arange(cmin, cmax + 1),
                         indexing='ij')
    pr = np.stack([rr.ravel(), cc.ravel()], -1).astype(np.float64)
    inside = np.ones(len(pr), bool)
    n = len(pts)
    # convex polygon: point is inside iff on the same side of every edge
    sign = 0.0
    for i in range(n):
        a, b = pts[i], pts[(i + 1) % n]
        cross = ((b[0] - a[0]) * (pr[:, 1] - a[1])
                 - (b[1] - a[1]) * (pr[:, 0] - a[0]))
        edge_sign = np.sign(cross)
        if sign == 0.0 and np.any(edge_sign != 0):
            sign = edge_sign[np.argmax(edge_sign != 0)]
        inside &= (cross * sign >= -1e-9)
    return pr[inside].astype(np.int64)


class CostGrid(NamedTuple):
    """Static BEV discretisation + ego footprints, built once on host.

    dx/bx follow the reference's gen_dx_bx convention (utils/tools.py:176):
    dx = resolution, bx = centre of the first cell."""
    dx: np.ndarray            # (2,) metres per cell
    bx: np.ndarray            # (2,) first-cell centre
    bev_dimension: Tuple[int, int]
    footprint: np.ndarray     # (P, 2) ego-box cells around origin, padded
    footprint_mask: np.ndarray  # (P,) valid cells
    footprint_lam: np.ndarray   # (P, 2) inflated (safety-lambda) footprint
    footprint_lam_mask: np.ndarray


def make_cost_grid(x_bound, y_bound, ego_width: float, ego_height: float,
                   safety_lambda: float) -> CostGrid:
    """Precompute grid constants + ego-box footprints (reference
    cost.py:50-83, once per module instead of per call)."""
    dx = np.array([x_bound[2], y_bound[2]], np.float32)
    bx = np.array([x_bound[0] + x_bound[2] / 2.0,
                   y_bound[0] + y_bound[2] / 2.0], np.float32)
    nx = int(round((x_bound[1] - x_bound[0]) / x_bound[2]))
    ny = int(round((y_bound[1] - y_bound[0]) / y_bound[2]))

    def box_cells(lam: float) -> np.ndarray:
        W, H = ego_width, ego_height
        pts = np.array([
            [-H / 2. + 0.5 - lam, W / 2. + lam],
            [H / 2. + 0.5 + lam, W / 2. + lam],
            [H / 2. + 0.5 + lam, -W / 2. - lam],
            [-H / 2. + 0.5 - lam, -W / 2. - lam]])
        pts = (pts - bx) / dx
        pts[:, [0, 1]] = pts[:, [1, 0]]
        return polygon_fill(pts[:, ::-1])  # (rows, cols)

    lam_cells = int(safety_lambda / float(dx[0]))
    base = box_cells(0)
    infl = box_cells(lam_cells)
    P = max(len(base), len(infl))

    def pad(cells):
        mask = np.zeros(P, bool)
        mask[:len(cells)] = True
        out = np.zeros((P, 2), np.int64)
        out[:len(cells)] = cells
        return out, mask

    fp, fp_m = pad(base)
    fl, fl_m = pad(infl)
    return CostGrid(dx, bx, (nx, ny), fp, fp_m, fl, fl_m)


# ----------------------------------------------------------------- primitives
def discretize(grid: CostGrid, trajs: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N, T, 2) metres -> clipped integer (row, col). Reference
    cost.py:129-143 (torch .long() truncation semantics): the row index
    comes from the y-component (trajs[..., 1]) and the column index from
    the x-component — the same (x, y) -> (col, row) swap get_points does."""
    yi = jnp.clip((trajs[..., 1] - grid.bx[0]) / grid.dx[0], 0,
                  grid.bev_dimension[0] - 1).astype(jnp.int32)
    xi = jnp.clip((trajs[..., 0] - grid.bx[1]) / grid.dx[1], 0,
                  grid.bev_dimension[1] - 1).astype(jnp.int32)
    return yi, xi


def _gather_bt(raster: jnp.ndarray, rr: jnp.ndarray, cc: jnp.ndarray
               ) -> jnp.ndarray:
    """raster (B, T, H, W); rr/cc (B, N, T, P) -> (B, N, T, P)."""
    B, T, H, W = raster.shape
    flat = raster.reshape(B, T, H * W)
    idx = rr * W + cc                               # (B, N, T, P)
    idx = jnp.moveaxis(idx, 2, 1)                   # (B, T, N, P)
    vals = jnp.take_along_axis(flat[:, :, None, :],
                               idx.reshape(B, T, -1)[:, :, None, :], axis=-1)
    vals = vals[:, :, 0].reshape(B, T, idx.shape[2], idx.shape[3])
    return jnp.moveaxis(vals, 1, 2)                 # (B, N, T, P)


def compute_area(grid: CostGrid, raster: jnp.ndarray, trajs: jnp.ndarray,
                 ego_velocity: jnp.ndarray | None = None,
                 inflated: bool = False) -> jnp.ndarray:
    """Sum `raster` over the ego footprint swept along each trajectory.

    raster (B, T, H, W), trajs (B, N, T, 2) -> (B, N, T).
    Reference cost.py:85-127 (get_points + compute_area)."""
    fp = grid.footprint_lam if inflated else grid.footprint
    fm = grid.footprint_lam_mask if inflated else grid.footprint_mask
    # reference get_points: trajs/dx first, then swap -> rows from y/dx1
    pix = (trajs / jnp.asarray(grid.dx))[..., ::-1]      # (B, N, T, 2) (r, c)
    pix = pix[..., None, :] + jnp.asarray(fp, pix.dtype)  # (B, N, T, P, 2)
    rr = jnp.clip(pix[..., 0].astype(jnp.int32), 0, grid.bev_dimension[0] - 1)
    cc = jnp.clip(pix[..., 1].astype(jnp.int32), 0, grid.bev_dimension[1] - 1)
    vals = _gather_bt(raster, rr, cc) * jnp.asarray(fm, raster.dtype)
    sub = vals.sum(-1)                                   # (B, N, T)
    if ego_velocity is not None:
        sub = sub * ego_velocity
    return sub


def ego_velocity_profile(trajs: jnp.ndarray, dt: float = 0.5) -> jnp.ndarray:
    """Speed per step: |p_t - p_{t-1}| / dt, first step from origin.

    Reference cost.py:215-221 (vectorised)."""
    prev = jnp.concatenate([jnp.zeros_like(trajs[:, :, :1]),
                            trajs[:, :, :-1]], axis=2)
    return jnp.sqrt(((trajs - prev) ** 2).sum(-1)) / dt


def _binary_channel(raster: jnp.ndarray) -> jnp.ndarray:
    """(B, 1or2, H, W) logits/mask -> (B, H, W) soft mask (reference
    cost.py:184-191: softmax channel 1, zero below 0.5)."""
    if raster.shape[1] == 2:
        prob = jax.nn.softmax(raster, axis=1)[:, 1]
        return jnp.where(prob < 0.5, 0.0, prob)
    return raster[:, 0]


# --------------------------------------------------------------------- costs
def safety_cost(grid: CostGrid, trajs, semantic_pred, lam_factor: float,
                factor: float) -> jnp.ndarray:
    """Occupancy swept at the nominal + velocity-weighted inflated footprint
    (reference SafetyCost:201-231)."""
    v = ego_velocity_profile(trajs)
    sub = (compute_area(grid, semantic_pred, trajs)
           + compute_area(grid, semantic_pred, trajs, v, inflated=True))
    return sub * factor


def headway_cost(grid: CostGrid, trajs, semantic_pred, drivable_area,
                 factor: float, lead_distance: float = 10.0) -> jnp.ndarray:
    """Occupancy 10 m ahead within the drivable area (HeadwayCost:234-263)."""
    drivable = _binary_channel(drivable_area)
    masked = semantic_pred * drivable[:, None]
    ahead = trajs.at[..., 1].add(lead_distance)
    return compute_area(grid, masked, ahead) * factor


def lr_divider_cost(grid: CostGrid, trajs, lane_divider, factor: float,
                    keep_distance: float = 1.0, chunk: int = 2048
                    ) -> jnp.ndarray:
    """Quadratic penalty for driving within `keep_distance` of a lane divider.

    Reference LR_divider:264-305 loops over torch.nonzero(lane) — dynamic.
    Here: exact running-min distance over *all* cells via a chunked scan,
    with non-lane cells at +inf."""
    lane = _binary_channel(lane_divider)                  # (B, H, W)
    B, H, W = lane.shape
    _, N, T, _ = trajs.shape

    yi, xi = discretize(grid, trajs)
    # trajectory cell centres in metres, reference uses (cell * reversed(dx))
    ty = yi.astype(jnp.float32) * grid.dx[1]
    tx = xi.astype(jnp.float32) * grid.dx[0]

    cells = H * W
    pad = (-cells) % chunk
    lane_flat = jnp.pad(lane.reshape(B, cells), ((0, 0), (0, pad)))
    rows = (jnp.arange(cells + pad) // W).astype(jnp.float32) * grid.dx[1]
    cols = (jnp.arange(cells + pad) % W).astype(jnp.float32) * grid.dx[0]
    n_chunks = (cells + pad) // chunk

    lane_c = lane_flat.reshape(B, n_chunks, chunk)
    rows_c = rows.reshape(n_chunks, chunk)
    cols_c = cols.reshape(n_chunks, chunk)

    def step(best, inp):
        lane_b, r, c = inp                               # (B,chunk),(chunk,)
        d2 = ((ty[..., None] - r) ** 2 + (tx[..., None] - c) ** 2)
        d2 = jnp.where(lane_b[:, None, None, :] > 0, d2, jnp.inf)
        return jnp.minimum(best, d2.min(-1)), None

    init = jnp.full((B, N, T), jnp.inf)
    best, _ = jax.lax.scan(step, init,
                           (jnp.moveaxis(lane_c, 1, 0), rows_c, cols_c))
    dist = jnp.sqrt(jnp.where(jnp.isfinite(best), best, jnp.inf))
    pen = jnp.where(dist > keep_distance, 0.0, (keep_distance - dist) ** 2)
    pen = jnp.where(jnp.isfinite(dist), pen, 0.0)
    return pen * factor


def comfort_cost(trajs, factor: float, dt: float = 0.5,
                 c_lat_acc: float = 3.0, c_lon_acc: float = 3.0,
                 c_jerk: float = 1.0) -> jnp.ndarray:
    """Lateral/longitudinal acceleration + jerk penalties (Comfort:307-370),
    vectorised diffs instead of per-step loops. Returns (B, N)."""
    prev = jnp.concatenate([jnp.zeros_like(trajs[:, :, :1]),
                            trajs[:, :, :-1]], axis=2)
    vel = (trajs - prev) / dt                        # (B, N, T, 2)
    acc = jnp.diff(vel, axis=2, prepend=vel[:, :, :1] * 0) / dt
    acc = acc.at[:, :, 0].set(0.0)
    lat_acc = jnp.abs(acc[..., 0]).max(-1)
    lon_acc = jnp.abs(acc[..., 1]).max(-1)

    speed = jnp.sqrt((vel ** 2).sum(-1))
    ego_acc = jnp.diff(speed, axis=2, prepend=speed[:, :, :1] * 0) / dt
    ego_acc = ego_acc.at[:, :, 0].set(0.0)
    jerk = jnp.diff(ego_acc, axis=2, prepend=ego_acc[:, :, :1] * 0) / dt
    jerk = jerk.at[:, :, :2].set(0.0)
    ego_jerk = jnp.abs(jerk).max(-1)

    sub = (jnp.clip(lat_acc - c_lat_acc, 0, 30) ** 2
           + jnp.clip(lon_acc - c_lon_acc, 0, 30) ** 2
           + jnp.clip(ego_jerk - c_jerk, 0, 20) ** 2)
    return sub * factor


def progress_cost(trajs, target_points, factor: float) -> jnp.ndarray:
    """Reward forward progress; penalise distance to the goal when one is
    set (Progress:372-392). Returns (B, N)."""
    fwd = trajs[..., 1].max(-1)                      # (B, N)
    has_target = jnp.sum(jnp.abs(target_points)) >= 0.5
    goal = ((trajs[:, :, -1] - target_points[:, None]) ** 2).sum(-1)
    sub2 = jnp.where(has_target, goal, 0.0)
    return (sub2 - fwd) * factor


def rule_cost(grid: CostGrid, trajs, drivable_area, factor: float = 5.0
              ) -> jnp.ndarray:
    """Penalty for leaving the drivable area (Rule:173-198)."""
    drivable = _binary_channel(drivable_area)
    dangerous = jnp.logical_not(drivable > 0).astype(trajs.dtype)
    T = trajs.shape[2]
    dang = jnp.broadcast_to(dangerous[:, None],
                            (dangerous.shape[0], T, *dangerous.shape[1:]))
    return compute_area(grid, dang, trajs) * factor


def costvolume_cost(grid: CostGrid, trajs, cost_volume, factor: float
                    ) -> jnp.ndarray:
    """Sample the learned cost volume along each trajectory
    (Cost_Volume:157-171)."""
    cv = jnp.clip(cost_volume, 0, 1000)              # (B, T, H, W)
    yi, xi = discretize(grid, trajs)                 # (B, N, T)
    B, T, H, W = cv.shape
    flat = cv.reshape(B, T, H * W)
    idx = jnp.moveaxis(yi * W + xi, 2, 1)            # (B, T, N)
    vals = jnp.take_along_axis(flat, idx, axis=-1)   # (B, T, N)
    return jnp.moveaxis(vals, 1, 2) * factor         # (B, N, T)


def total_cost(grid: CostGrid, cfg_cost, cost_volume, trajs, semantic_pred,
               lane_divider, drivable_area, target_points
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aggregate all sub-costs (Cost_Function.forward:25-46).

    trajs arrive in ego (x, y); the x-flip to raster convention happens
    here (reference :35).  Returns (cost_fc (B, N), cost_fo (B, N, T))."""
    trajs = trajs * jnp.asarray([-1.0, 1.0], trajs.dtype)
    clip01 = functools.partial(jnp.clip, min=0.0, max=100.0)

    safety = clip01(safety_cost(grid, trajs, semantic_pred,
                                cfg_cost.LAMBDA, cfg_cost.SAFETY))
    headway = clip01(headway_cost(grid, trajs, semantic_pred, drivable_area,
                                  cfg_cost.HEADWAY))
    lrdiv = clip01(lr_divider_cost(grid, trajs, lane_divider,
                                   cfg_cost.LRDIVIDER))
    comfort = clip01(comfort_cost(trajs, cfg_cost.COMFORT))
    progress = jnp.clip(progress_cost(trajs, target_points,
                                      cfg_cost.PROGRESS), -100.0, 100.0)
    rule = clip01(rule_cost(grid, trajs, drivable_area))
    volume = clip01(costvolume_cost(grid, trajs, cost_volume,
                                    cfg_cost.VOLUME))

    cost_fo = safety + headway + lrdiv + volume + rule   # (B, N, T)
    cost_fc = comfort + progress                          # (B, N)
    return cost_fc, cost_fo
