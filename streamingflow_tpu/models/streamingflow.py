"""StreamingFlow top-level model: async camera+LiDAR streams -> BEV futures.

Reference: streamingflow/models/streamingflow.py (class streamingflow:24,
forward:209-275).  Everything is channels-last and jit-compatible: the
reference's per-(b, t) Python pooling loops are batched (ops/lift_splat.py)
and the GRU-ODE timeline is a static masked tape (layers/ode.py).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import geometry as G
from ..config import Config
from ..ops.lift_splat import projection_to_birds_eye_view
from .decoder import Decoder
from .distributions import DistributionModule, distribution_forward
from .encoder import Encoder
from .future_prediction import FuturePredictionODE
from .lidar_encoder import LidarBEVEncoder
from .pillar_encoder import PillarBEVEncoder
from .planning import Planning
from .temporal_model import TemporalModel, TemporalModelIdentity


class StreamingFlow(nn.Module):
    cfg: Config

    def setup(self):
        cfg = self.cfg

        # MODEL.REMAT: rematerialise the major sub-modules so the backward
        # pass recomputes their internals instead of storing them — the
        # flagship train step otherwise exceeds one v5e's HBM by ~1.6G.
        # `train` is the trailing positional arg of every wrapped __call__
        # (static: it selects BN/dropout branches).
        def remat(cls, static_argnums=(2,)):
            if not cfg.MODEL.REMAT:
                return cls
            return nn.remat(cls, static_argnums=static_argnums)

        self.bev_resolution, self.bev_start_position, self.bev_dimension = \
            G.calculate_birds_eye_view_parameters(
                cfg.LIFT.X_BOUND, cfg.LIFT.Y_BOUND, cfg.LIFT.Z_BOUND)
        self.frustum = G.create_frustum(
            cfg.IMAGE.FINAL_DIM, cfg.MODEL.ENCODER.DOWNSAMPLE, cfg.LIFT.D_BOUND)
        self.depth_channels = self.frustum.shape[0]
        self.receptive_field = cfg.TIME_RECEPTIVE_FIELD
        self.n_future = cfg.N_FUTURE_FRAMES
        self.use_camera = cfg.MODEL.MODALITY.USE_CAMERA
        self.use_lidar = cfg.MODEL.MODALITY.USE_LIDAR
        self.latent_dim = cfg.MODEL.DISTRIBUTION.LATENT_DIM
        bev_size = (int(self.bev_dimension[0]), int(self.bev_dimension[1]))

        if self.use_camera:
            self.encoder = remat(Encoder)(
                out_channels=cfg.MODEL.ENCODER.OUT_CHANNELS,
                depth_channels=self.depth_channels,
                backbone_name=cfg.MODEL.ENCODER.NAME,
                downsample=cfg.MODEL.ENCODER.DOWNSAMPLE,
                use_depth_distribution=cfg.MODEL.ENCODER.USE_DEPTH_DISTRIBUTION)
            if cfg.MODEL.TEMPORAL_MODEL.NAME == 'identity':
                self.temporal_model = TemporalModelIdentity()
            else:
                self.temporal_model = remat(TemporalModel)(
                    receptive_field=self.receptive_field,
                    input_shape=bev_size,
                    start_out_channels=cfg.MODEL.TEMPORAL_MODEL.START_OUT_CHANNELS,
                    extra_in_channels=cfg.MODEL.TEMPORAL_MODEL.EXTRA_IN_CHANNELS,
                    inbetween_layers=cfg.MODEL.TEMPORAL_MODEL.INBETWEEN_LAYERS,
                    use_pyramid_pooling=cfg.MODEL.TEMPORAL_MODEL.PYRAMID_POOLING)

        if self.use_lidar:
            if cfg.MODEL.LIDAR.BACKBONE == 'pillar8x':
                self.lidar_encoder = remat(PillarBEVEncoder)(
                    cfg.MODEL.SPARSE_ENCODER,
                    tile_sorted=cfg.MODEL.LIDAR.TILE_SORTED_POINTS)
            else:
                self.lidar_encoder = remat(LidarBEVEncoder)(cfg.MODEL.SPARSE_ENCODER)
            self.lidar_pre_reduce = cfg.MODEL.LIDAR.PRE_REDUCE_TEMPORAL
            if self.lidar_pre_reduce:
                self.lidar_reduce = nn.Conv(
                    cfg.MODEL.TEMPORAL_MODEL.START_OUT_CHANNELS, (1, 1),
                    use_bias=False, name='lidar_reduce')
            self.temporal_model_lidar = remat(TemporalModel)(
                receptive_field=self.receptive_field,
                input_shape=bev_size,
                start_out_channels=cfg.MODEL.TEMPORAL_MODEL.START_OUT_CHANNELS,
                extra_in_channels=cfg.MODEL.TEMPORAL_MODEL.EXTRA_IN_CHANNELS,
                inbetween_layers=cfg.MODEL.TEMPORAL_MODEL.INBETWEEN_LAYERS,
                use_pyramid_pooling=cfg.MODEL.TEMPORAL_MODEL.PYRAMID_POOLING)

        future_pred_in = cfg.MODEL.TEMPORAL_MODEL.START_OUT_CHANNELS
        if self.n_future > 0:
            self.future_prediction = remat(
                FuturePredictionODE, static_argnums=(7,))(
                in_channels=future_pred_in,
                latent_dim=self.latent_dim,
                delta_t=cfg.MODEL.FUTURE_PRED.DELTA_T,
                n_gru_blocks=cfg.MODEL.FUTURE_PRED.N_GRU_BLOCKS,
                n_res_layers=cfg.MODEL.FUTURE_PRED.N_RES_LAYERS,
                solver=cfg.MODEL.SOLVER,
                impute=cfg.MODEL.IMPUTE,
                variable_step=cfg.MODEL.FUTURE_PRED.USE_VARIABLE_ODE_STEP,
                srvp_filter_size=cfg.MODEL.SMALL_ENCODER.FILTER_SIZE,
                skipco=cfg.MODEL.SMALL_ENCODER.SKIPCO,
                max_gap_seconds=cfg.MODEL.FUTURE_PRED.MAX_GAP_SECONDS,
                stochastic=cfg.PROBABILISTIC.ENABLED)

        if cfg.PLANNING.ENABLED:
            self.planning = Planning(
                cfg=cfg, feature_channel=cfg.MODEL.ENCODER.OUT_CHANNELS,
                gru_state_size=cfg.PLANNING.GRU_STATE_SIZE)

        if cfg.PROBABILISTIC.ENABLED:
            # latent sampling head (reference streamingflow.py:448-511 +
            # distributions.py:7); the reference never invokes it on its
            # shipped forward path, so it is exposed as the
            # `distribution_forward` method rather than spliced into
            # __call__ — see docs/PARITY.md
            self.present_distribution = DistributionModule(
                in_channels=cfg.MODEL.TEMPORAL_MODEL.START_OUT_CHANNELS,
                latent_dim=self.latent_dim,
                method=cfg.PROBABILISTIC.METHOD)

        self.decoder = remat(Decoder)(
            n_classes=len(cfg.SEMANTIC_SEG.VEHICLE.WEIGHTS),
            n_present=self.receptive_field,
            n_hdmap=len(cfg.SEMANTIC_SEG.HDMAP.ELEMENTS),
            predict_pedestrian=cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED,
            perceive_hdmap=cfg.SEMANTIC_SEG.HDMAP.ENABLED,
            predict_instance=cfg.INSTANCE_SEG.ENABLED,
            predict_future_flow=cfg.INSTANCE_FLOW.ENABLED,
            planning=cfg.PLANNING.ENABLED)

    def distribution_forward(self, present_features, min_log_sigma: float = -5.0,
                             max_log_sigma: float = 5.0,
                             train: bool = False) -> jnp.ndarray:
        """Sample a spatially-broadcast latent from the present state.

        present_features: (B, 1, H, W, C).  Returns (B, 1, H, W, latent).
        Reference streamingflow.py:448-511 (noise gated on training mode)."""
        params = self.present_distribution(present_features, train=train)
        rng = self.make_rng('sample') if train else None
        return distribution_forward(
            params, self.latent_dim, self.cfg.PROBABILISTIC.METHOD,
            present_features.shape[2:4], rng,
            min_log_sigma=min_log_sigma, max_log_sigma=max_log_sigma)

    # ----------------------------------------------------------------- camera
    def calculate_birds_eye_view_features(self, image, intrinsics, extrinsics,
                                          future_egomotion, train):
        """Reference streamingflow.py:430-446. image: (B, S, N, H, W, 3)."""
        b, s, n = image.shape[:3]
        frustum = jnp.asarray(self.frustum)
        geometry = G.get_geometry(
            frustum, intrinsics.reshape(b * s, n, 3, 3),
            extrinsics.reshape(b * s, n, 4, 4))
        geometry = geometry.reshape(b, s, *geometry.shape[1:])

        flat_imgs = image.reshape(b * s * n, *image.shape[3:])
        feature, depth = self.encoder(flat_imgs, train)
        fh, fw = feature.shape[1:3]

        # present-frame front-camera feature for the planning head
        # (reference streamingflow.py:294-303 cam_front_index=1, :443)
        names = list(self.cfg.IMAGE.NAMES)
        front_idx = names.index('CAM_FRONT') if 'CAM_FRONT' in names \
            else min(1, n - 1)
        cam_front = feature.reshape(b, s, n, fh, fw, -1)[:, -1, front_idx]

        if depth is not None:
            depth_prob = nn.softmax(depth, axis=-1)
            # outer product depth x features (reference :305-307); the
            # broadcast-multiply + moveaxis fuses better than an einsum here
            # (measured: einsum lowers to a contraction and costs ~8 ms more)
            x = depth_prob[..., :, None] * feature[..., None, :]
            # (b*s*n, fh, fw, D, C) -> (b, s, n, D, fh, fw, C)
            x = jnp.moveaxis(x, 3, 1)
            depth_out = depth.reshape(b, s, n, fh, fw, self.depth_channels)
        else:
            x = jnp.broadcast_to(
                feature[:, None],
                (feature.shape[0], self.depth_channels, fh, fw,
                 feature.shape[-1]))
            depth_out = None
        x = x.reshape(b, s, n, self.depth_channels, fh, fw, x.shape[-1])

        ego_mat = G.pose_vec2mat(future_egomotion)
        bev = projection_to_birds_eye_view(
            x, geometry, ego_mat, self.bev_start_position,
            self.bev_resolution, self.bev_dimension,
            discount=self.cfg.LIFT.DISCOUNT,
            backend=self.cfg.MODEL.BEV_POOL_BACKEND)
        return bev, depth_out, cam_front

    # ------------------------------------------------------------------- main
    def __call__(self, image=None, intrinsics=None, extrinsics=None,
                 future_egomotion=None, camera_timestamp=None, points=None,
                 lidar_timestamp=None, target_timestamp=None,
                 train: bool = False) -> Dict[str, Optional[jnp.ndarray]]:
        cfg = self.cfg
        rf = self.receptive_field
        output: Dict[str, Optional[jnp.ndarray]] = {}
        camera_states = None
        lidar_states = None
        states = None

        future_egomotion = future_egomotion[:, :rf]

        if self.use_lidar:
            # points: (B, T_l, P, C_pt) padded clouds
            feat = self.lidar_encoder(points, train)  # (B,T_l,X,Y,256)
            if self.lidar_pre_reduce:
                feat = self.lidar_reduce(feat)
            lidar_states = self.temporal_model_lidar(feat, train)
            states = lidar_states

        if self.use_camera:
            image = image[:, :rf]
            intrinsics = intrinsics[:, :rf]
            extrinsics = extrinsics[:, :rf]
            x, depth, cam_front = self.calculate_birds_eye_view_features(
                image, intrinsics, extrinsics, future_egomotion, train)
            output['depth_prediction'] = depth
            output['cam_front'] = cam_front

            if cfg.MODEL.TEMPORAL_MODEL.INPUT_EGOPOSE:
                b, s = x.shape[:2]
                h, w = x.shape[2:4]
                ego_spatial = jnp.broadcast_to(
                    future_egomotion[:, :, None, None, :], (b, s, h, w, 6))
                # zero egomotion at t=0 (reference :251-252)
                ego_spatial = jnp.concatenate(
                    [jnp.zeros_like(ego_spatial[:, :1]),
                     ego_spatial[:, :rf - 1]], axis=1)
                x = jnp.concatenate([x, ego_spatial.astype(x.dtype)], axis=-1)
            camera_states = self.temporal_model(x, train)
            states = camera_states

        if self.n_future > 0:
            present_state = states[:, -1:]
            states = self.future_prediction(
                present_state, camera_states, camera_timestamp,
                lidar_states, lidar_timestamp, target_timestamp, train)

        output.update(self.decoder(states, train))
        return output
