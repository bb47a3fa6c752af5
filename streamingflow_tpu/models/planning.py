"""Command-conditioned trajectory planning head.

Reference: streamingflow/models/planning_model.py (Planning:10, select:47-64,
max-margin loss:66-87, GRU refinement:129-145).

TPU-native notes:
* Commands are int32 codes (0=LEFT, 1=FORWARD, 2=RIGHT, 3=ALL) instead of
  strings; the per-sample branch at reference :104-115 becomes one batched
  gather of candidate indices (the "repeat(3,1,1)" semantics are preserved
  by tiling the command's third of the sample set to the full width).
* The GRU refinement loop over n_future steps (reference :135-143) has a
  static trip count and stays a Python loop (unrolled under jit).
* The front-camera feature is reduced by strided bottlenecks then
  global-average-pooled + projected to the GRU state size — the reference
  flattens exact spatial dims (:139), which couples the head to one input
  resolution; pooling keeps the same information path shape-robustly.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..layers.conv import Bottleneck
from ..ops import cost as C


def select_command_trajs(trajs: jnp.ndarray, commands: jnp.ndarray,
                         num: int) -> jnp.ndarray:
    """Pick the command's third of the sample set, tiled to full width.

    trajs (B, N, T, 3), commands (B,) int codes; N = 3*num.
    Reference planning_model.py:104-115."""
    n = trajs.shape[1]
    base = jnp.tile(jnp.arange(num), n // num)            # (N,)
    offs = jnp.where(commands < 3, commands * num, 0)     # (B,)
    idx = jnp.where((commands < 3)[:, None], base[None] + offs[:, None],
                    jnp.arange(n)[None])
    return jnp.take_along_axis(trajs, idx[:, :, None, None], axis=1)


class ReduceChannel(nn.Module):
    """Strided bottleneck pyramid over the front-cam feature (reference
    planning_model.py:20-25).  Downsampling steps are skipped once a spatial
    dim would collapse below 2 px, so the head stays valid at any feature
    resolution (shapes are static at trace time, so this is jit-safe)."""
    feature_channel: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        fc = self.feature_channel
        for c, ds in [(fc, True), (fc // 2, True), (fc // 2, True),
                      (max(fc // 8, 1), False)]:
            ds = ds and min(x.shape[1], x.shape[2]) >= 2
            x = Bottleneck(c, downsample=ds)(x, train=train)
        return x


class Planning(nn.Module):
    """Cost-based selection + GRU refinement of the best candidate."""
    cfg: Config
    feature_channel: int
    gru_state_size: int = 256

    def setup(self):
        cfg = self.cfg
        self.sample_num = cfg.PLANNING.SAMPLE_NUM
        assert self.sample_num % 3 == 0
        self.num = self.sample_num // 3
        self.grid = C.make_cost_grid(
            cfg.LIFT.X_BOUND, cfg.LIFT.Y_BOUND, cfg.EGO.WIDTH, cfg.EGO.HEIGHT,
            cfg.COST_FUNCTION.LAMBDA)
        self.reduce_channel = ReduceChannel(self.feature_channel)
        self.h0_proj = nn.Dense(self.gru_state_size)
        self.gru = nn.GRUCell(features=self.gru_state_size)
        self.dec1 = nn.Dense(self.gru_state_size)
        self.dec2 = nn.Dense(2)

    def _costs(self, trajs, cost_volume, semantic_pred, lane_divider,
               drivable_area, target_points):
        return C.total_cost(self.grid, self.cfg.COST_FUNCTION, cost_volume,
                            trajs[..., :2], semantic_pred, lane_divider,
                            drivable_area, target_points)

    def select(self, trajs, cost_volume, semantic_pred, lane_divider,
               drivable_area, target_points) -> jnp.ndarray:
        """argmin of total cost over candidates (reference :47-64)."""
        fc, fo = self._costs(trajs, cost_volume, semantic_pred, lane_divider,
                             drivable_area, target_points)
        total = fc + fo.sum(-1)                           # (B, N)
        best = jnp.argmin(total, axis=1)                  # (B,)
        return jnp.take_along_axis(
            trajs, best[:, None, None, None], axis=1)[:, 0]  # (B, T, 3)

    def loss(self, trajs, gt_trajs, cost_volume, semantic_pred, lane_divider,
             drivable_area, target_points) -> jnp.ndarray:
        """Max-margin: gt cost must undercut each sample's cost by its L2
        distance to gt (reference :66-87)."""
        fc, fo = self._costs(trajs, cost_volume, semantic_pred, lane_divider,
                             drivable_area, target_points)
        gt = gt_trajs[:, None]                            # (B, 1, T, 3)
        gfc, gfo = self._costs(gt, cost_volume, semantic_pred, lane_divider,
                               drivable_area, target_points)
        l2 = ((trajs[..., :2] - gt[..., :2]) ** 2).sum(-1).mean(-1)  # (B, N)
        margin = (nn.relu(gfo - fo).sum(-1) + (gfc - fc) + l2)
        return nn.relu(margin).max(-1).mean()

    def __call__(self, cam_front, trajs, gt_trajs, cost_volume, semantic_pred,
                 hd_map, commands, target_points, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """cam_front (B, fh, fw, C); trajs (B, N, T, 3); gt_trajs (B, T, 3);
        cost_volume/semantic_pred (B, T, H, W); hd_map (B, 2|4, H, W);
        commands (B,) int32; target_points (B, 2).
        Returns (loss, output_traj (B, T, 3)).  Reference :89-150."""
        cur_trajs = select_command_trajs(trajs, commands, self.num)

        if hd_map.shape[1] == 2:
            lane_divider, drivable_area = hd_map[:, 0:1], hd_map[:, 1:2]
        elif hd_map.shape[1] == 4:
            lane_divider, drivable_area = hd_map[:, 0:2], hd_map[:, 2:4]
        else:
            raise NotImplementedError('hd_map must have 2 or 4 channels')

        loss = 0.0
        if train:
            loss = self.loss(cur_trajs, gt_trajs, cost_volume, semantic_pred,
                             lane_divider, drivable_area, target_points)

        h = self.reduce_channel(cam_front, train=train)
        h0 = self.h0_proj(h.mean(axis=(1, 2)))            # (B, state)

        final_traj = self.select(cur_trajs, cost_volume, semantic_pred,
                                 lane_divider, drivable_area, target_points)
        b, s, _ = final_traj.shape
        tp = target_points.astype(h0.dtype)
        x = jnp.zeros((b, 2), h0.dtype)
        outs = []
        for i in range(s):
            inp = jnp.concatenate([x, final_traj[:, i, :2], tp], axis=-1)
            h0, _ = self.gru(h0, inp)
            x = self.dec2(nn.relu(self.dec1(h0)))
            outs.append(x)
        output_traj = jnp.stack(outs, axis=1)             # (B, T, 2)
        output_traj = jnp.concatenate(
            [output_traj, jnp.zeros((*output_traj.shape[:-1], 1),
                                    output_traj.dtype)], axis=-1)

        if train:
            huber = optax_smooth_l1(output_traj[..., :2], gt_trajs[..., :2])
            loss = loss * 0.5 + (huber * jnp.asarray([10.0, 1.0])).mean()
        return loss, output_traj


def optax_smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
                    beta: float = 1.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (torch F.smooth_l1_loss, reduction='none')."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
