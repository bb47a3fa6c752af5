"""Training harness: label preparation, uncertainty-weighted loss, train step.

Reference: streamingflow/trainer.py (TrainingModule:14, shared_step:105,
prepare_future_labels:283, configure_optimizers:494) re-expressed as pure
functions over a flax TrainState.  The per-task uncertainty log-variances
(reference trainer.py:46-101, ``1/(2 e^w)`` factors :151-218) live in the
parameter tree under 'task_weights' and are trained jointly.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax.training import train_state

from .. import geometry as G
from ..config import Config
from ..models.streamingflow import StreamingFlow
from . import losses as L


class TaskWeights(nn.Module):
    """Learned homoscedastic task uncertainties (reference trainer.py:46-101)."""
    cfg: Config

    @nn.compact
    def __call__(self):
        names = ['segmentation']
        cfg = self.cfg
        if cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED:
            names.append('pedestrian')
        if cfg.SEMANTIC_SEG.HDMAP.ENABLED:
            names.append('hdmap')
        if cfg.LIFT.GT_DEPTH:
            names.append('depths')
        if cfg.INSTANCE_SEG.ENABLED:
            names += ['centerness', 'offset']
        if cfg.INSTANCE_FLOW.ENABLED:
            names.append('flow')
        if cfg.PLANNING.ENABLED:
            names.append('planning')
        return {n: self.param(f'{n}_weight', nn.initializers.zeros, ())
                for n in names}


class StreamingFlowTrainModule(nn.Module):
    """Model + task weights under one parameter tree."""
    cfg: Config

    def setup(self):
        self.model = StreamingFlow(self.cfg)
        self.task_weights = TaskWeights(self.cfg)

    def __call__(self, *args, planning_inputs=None, train: bool = False,
                 **kwargs):
        output = self.model(*args, train=train, **kwargs)
        if self.cfg.PLANNING.ENABLED and planning_inputs is not None:
            rf = self.cfg.TIME_RECEPTIVE_FIELD
            # cam_front/costvolume are detached exactly like reference
            # trainer.py:207-216 (the planner trains on frozen perception).
            pl_loss, final_traj = self.model.planning(
                cam_front=jax.lax.stop_gradient(output['cam_front']),
                trajs=planning_inputs['trajs'],
                gt_trajs=planning_inputs['gt_trajs'],
                cost_volume=output['costvolume'][:, rf:],
                semantic_pred=planning_inputs['occupancy'],
                hd_map=planning_inputs['hdmap'],
                commands=planning_inputs['commands'],
                target_points=planning_inputs['target_points'],
                train=train)
            output['planning_loss'] = pl_loss
            output['selected_traj'] = jnp.concatenate(
                [jnp.zeros_like(final_traj[:, :1]), final_traj], axis=1)
        return output, self.task_weights()


def prepare_future_labels(batch: Dict[str, jnp.ndarray], cfg: Config
                          ) -> Dict[str, jnp.ndarray]:
    """Warp labels into the present reference frame (trainer.py:283-394).

    Labels are channels-last (B, T, H, W, C); instance is (B, T, H, W)."""
    rf = cfg.TIME_RECEPTIVE_FIELD
    spatial_extent = (cfg.LIFT.X_BOUND[1], cfg.LIFT.Y_BOUND[1])
    ego = batch['future_egomotion']
    labels: Dict[str, jnp.ndarray] = {}

    def warp_both(x):
        past = G.cumulative_warp_features(
            x[:, :rf].astype(jnp.float32), ego[:, :rf], mode='nearest',
            spatial_extent=spatial_extent)[:, :-1]
        future = G.cumulative_warp_features_reverse(
            x[:, rf - 1:].astype(jnp.float32), ego[:, rf - 1:],
            mode='nearest', spatial_extent=spatial_extent)
        return jnp.concatenate([past, future], axis=1)

    labels['gt_trajectory'] = batch.get('gt_trajectory')

    if cfg.LIFT.GT_DEPTH:
        ds = cfg.MODEL.ENCODER.DOWNSAMPLE
        depths = batch['depths'][:, :rf, :, ::ds, ::ds]
        depths = jnp.clip(depths, cfg.LIFT.D_BOUND[0], cfg.LIFT.D_BOUND[1] - 1)
        labels['depths'] = (depths - cfg.LIFT.D_BOUND[0]).astype(jnp.int32)

    labels['segmentation'] = warp_both(batch['segmentation']).astype(jnp.int32)
    if cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED:
        labels['pedestrian'] = warp_both(batch['pedestrian']).astype(jnp.int32)
    if cfg.INSTANCE_SEG.ENABLED:
        labels['instance'] = warp_both(
            batch['instance'][..., None]).astype(jnp.int32)[..., 0]
        labels['centerness'] = warp_both(batch['centerness'])
        labels['offset'] = warp_both(batch['offset'])
    if cfg.INSTANCE_FLOW.ENABLED:
        labels['flow'] = warp_both(batch['flow'])
    if cfg.SEMANTIC_SEG.HDMAP.ENABLED:
        labels['hdmap'] = batch['hdmap'].astype(jnp.int32)
    return labels


def compute_losses(output: Dict[str, jnp.ndarray],
                   labels: Dict[str, jnp.ndarray],
                   weights: Dict[str, jnp.ndarray],
                   cfg: Config) -> Dict[str, jnp.ndarray]:
    """Uncertainty-weighted loss dict (reference trainer.py:149-218)."""
    rf = cfg.TIME_RECEPTIVE_FIELD
    fd = cfg.FUTURE_DISCOUNT
    loss: Dict[str, jnp.ndarray] = {}

    def factor(name):
        return 1.0 / (2.0 * jnp.exp(weights[name]))

    loss['segmentation'] = factor('segmentation') * L.segmentation_loss(
        output['segmentation'], labels['segmentation'],
        cfg.SEMANTIC_SEG.VEHICLE.WEIGHTS, n_present=rf,
        use_top_k=cfg.SEMANTIC_SEG.VEHICLE.USE_TOP_K,
        top_k_ratio=cfg.SEMANTIC_SEG.VEHICLE.TOP_K_RATIO, future_discount=fd)
    loss['segmentation_uncertainty'] = 0.5 * weights['segmentation']

    if cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED:
        loss['pedestrian'] = factor('pedestrian') * L.segmentation_loss(
            output['pedestrian'], labels['pedestrian'],
            cfg.SEMANTIC_SEG.PEDESTRIAN.WEIGHTS, n_present=rf,
            use_top_k=cfg.SEMANTIC_SEG.PEDESTRIAN.USE_TOP_K,
            top_k_ratio=cfg.SEMANTIC_SEG.PEDESTRIAN.TOP_K_RATIO,
            future_discount=fd)
        loss['pedestrian_uncertainty'] = 0.5 * weights['pedestrian']

    if cfg.SEMANTIC_SEG.HDMAP.ENABLED:
        loss['hdmap'] = factor('hdmap') * L.hdmap_loss(
            output['hdmap'], labels['hdmap'],
            cfg.SEMANTIC_SEG.HDMAP.WEIGHTS, cfg.SEMANTIC_SEG.HDMAP.TRAIN_WEIGHT,
            cfg.SEMANTIC_SEG.HDMAP.USE_TOP_K, cfg.SEMANTIC_SEG.HDMAP.TOP_K_RATIO)
        loss['hdmap_uncertainty'] = 0.5 * weights['hdmap']

    if cfg.INSTANCE_SEG.ENABLED:
        loss['instance_center'] = factor('centerness') * \
            L.spatial_regression_loss(output['instance_center'],
                                      labels['centerness'], norm=2,
                                      n_present=rf, future_discount=fd)
        loss['centerness_uncertainty'] = 0.5 * weights['centerness']
        loss['instance_offset'] = factor('offset') * \
            L.spatial_regression_loss(output['instance_offset'],
                                      labels['offset'], norm=1, n_present=rf,
                                      ignore_index=cfg.DATASET.IGNORE_INDEX,
                                      future_discount=fd)
        loss['offset_uncertainty'] = 0.5 * weights['offset']

    if cfg.LIFT.GT_DEPTH and output.get('depth_prediction') is not None:
        loss['depths'] = factor('depths') * L.depth_loss(
            output['depth_prediction'], labels['depths'])
        loss['depths_uncertainty'] = 0.5 * weights['depths']

    if cfg.INSTANCE_FLOW.ENABLED:
        loss['instance_flow'] = factor('flow') * L.spatial_regression_loss(
            output['instance_flow'], labels['flow'], norm=1, n_present=rf,
            ignore_index=cfg.DATASET.IGNORE_INDEX, future_discount=fd)
        loss['flow_uncertainty'] = 0.5 * weights['flow']

    if cfg.PLANNING.ENABLED and output.get('planning_loss') is not None:
        loss['planning'] = factor('planning') * output['planning_loss']
        loss['planning_uncertainty'] = 0.5 * weights['planning']

    return loss


def build_planning_inputs(batch, labels, cfg: Config):
    """Assemble planner inputs from batch + warped labels.

    Reference trainer.py:202-216: occupancy = seg OR pedestrian future
    labels; candidate trajectories come from the CAN-bus sampler
    (batch['sample_trajectory']); hd_map is the label raster at train time."""
    if not cfg.PLANNING.ENABLED:
        return None
    rf = cfg.TIME_RECEPTIVE_FIELD
    occ = labels['segmentation'][:, rf:, :, :, 0]
    if cfg.SEMANTIC_SEG.PEDESTRIAN.ENABLED:
        occ = jnp.logical_or(occ, labels['pedestrian'][:, rf:, :, :, 0])
    if 'hdmap' in batch:
        hdmap = batch['hdmap'].astype(jnp.float32)
    else:
        # the reference's hdmap rasterisation is disabled in its own loader
        # (NuscenesData.py:813/:824 commented out), so planning must work
        # without a map raster — the planner's map costs see zeros
        h, w = occ.shape[-2:]
        hdmap = jnp.zeros((occ.shape[0], 2, h, w), jnp.float32)
    return dict(
        trajs=batch['sample_trajectory'][:, :, 1:],
        gt_trajs=batch['gt_trajectory'][:, 1:],
        occupancy=occ.astype(jnp.float32),
        hdmap=hdmap,
        commands=batch['command'].astype(jnp.int32),
        target_points=batch['target_point'])


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(cfg: Config, rng: jax.Array, batch) -> TrainState:
    module = StreamingFlowTrainModule(cfg)
    model_args = batch_to_model_args(batch, cfg)
    planning_inputs = None
    if cfg.PLANNING.ENABLED:
        labels = prepare_future_labels(batch, cfg)
        planning_inputs = build_planning_inputs(batch, labels, cfg)
    variables = jax.jit(module.init, static_argnames=())(
        {'params': rng, 'dropout': rng, 'sample': rng}, **model_args,
        planning_inputs=planning_inputs)
    # torch Adam(weight_decay) adds wd*p to the gradient before the moment
    # updates (non-decoupled) — clip first like Lightning's grad clipping.
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.GRAD_NORM_CLIP),
        optax.add_decayed_weights(cfg.OPTIMIZER.WEIGHT_DECAY),
        optax.adam(cfg.OPTIMIZER.LR))
    return TrainState.create(
        apply_fn=module.apply, params=variables['params'], tx=tx,
        batch_stats=variables.get('batch_stats', {}))


def batch_to_model_args(batch, cfg: Config) -> Dict[str, jnp.ndarray]:
    return dict(
        image=batch['image'] if cfg.MODEL.MODALITY.USE_CAMERA else None,
        intrinsics=batch['intrinsics'] if cfg.MODEL.MODALITY.USE_CAMERA else None,
        extrinsics=batch['extrinsics'] if cfg.MODEL.MODALITY.USE_CAMERA else None,
        future_egomotion=batch['future_egomotion'],
        camera_timestamp=batch['camera_timestamp'],
        points=batch['points'] if cfg.MODEL.MODALITY.USE_LIDAR else None,
        lidar_timestamp=batch['lidar_timestamp'],
        target_timestamp=batch['target_timestamp'])


def make_train_step(cfg: Config):
    """Build the jitted training step (forward, loss, grad, clip, adam)."""

    def train_step(state: TrainState, batch, rng: jax.Array
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        labels = prepare_future_labels(batch, cfg)
        model_args = batch_to_model_args(batch, cfg)
        rngs = {'dropout': rng, 'sample': jax.random.fold_in(rng, 1)}

        planning_inputs = build_planning_inputs(batch, labels, cfg)

        def loss_fn(params):
            (output, weights), updates = state.apply_fn(
                {'params': params, 'batch_stats': state.batch_stats},
                **model_args, planning_inputs=planning_inputs, train=True,
                rngs=rngs, mutable=['batch_stats', 'diagnostics'])
            loss_dict = compute_losses(output, labels, weights, cfg)
            total = sum(loss_dict.values())
            return total, (loss_dict, updates)

        (total, (loss_dict, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=updates['batch_stats'])
        metrics = {'total_loss': total, **loss_dict}
        # cap observability: static-capacity drop counters sown by the
        # sparse engines (VERDICT r3 item 6) — surfaced so the train loop
        # can warn instead of dropping data silently
        for k, v in _flatten_diagnostics(
                updates.get('diagnostics', {})).items():
            metrics[f'diag/{k}'] = v
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,))


def _flatten_diagnostics(tree) -> Dict[str, jnp.ndarray]:
    """Sown 'diagnostics' collection -> flat {leaf_name: scalar} dict
    (sow stores tuples; the counters here are single-valued)."""
    out: Dict[str, jnp.ndarray] = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = [p.key for p in path if hasattr(p, 'key')][-1]
        out[name] = jnp.asarray(leaf).reshape(())
    return out


class PackedTrainState(NamedTuple):
    """TrainState with params / BN stats / Adam moments fused into single
    fp32 vectors.

    The training state of the flagship model is ~2,300 small buffers
    (params + Adam m/v + BN stats).  Measured on the v5e runtime, per-call
    dispatch cost grows with (argument buffer count x loaded-executable
    size): the flagship train step spent ~87 s/call in host-side dispatch
    against ~0.9 s of device compute (docs/PERF.md round-4 notes).  Fusing
    the state into three flat vectors (params, batch_stats, m/v inside the
    optax state) collapses the call surface to ~8 buffers and returns the
    step to device-bound speed — and is good production hygiene regardless
    (single contiguous DMA per state tensor, no tiny-buffer bookkeeping).

    `opt_state` keeps the optax chain structure with ScaleByAdamState's
    mu/nu as flat vectors (exact round-trip to/from the unpacked state, so
    checkpoints stay in the portable unpacked layout)."""
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Any


def _pack_adam(opt_state):
    from jax.flatten_util import ravel_pytree

    def fix(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                s.count, ravel_pytree(s.mu)[0], ravel_pytree(s.nu)[0])
        return s
    return jax.tree_util.tree_map(
        fix, opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))


def _unpack_adam(opt_state, p_unravel):
    def fix(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                s.count, p_unravel(s.mu), p_unravel(s.nu))
        return s
    return jax.tree_util.tree_map(
        fix, opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))


def _unravel_like(tree):
    """Unravel closure from shapes/dtypes only — safe on a template whose
    buffers were donated away (aval metadata survives deletion)."""
    import numpy as np

    from jax.flatten_util import ravel_pytree
    skel = jax.tree.map(lambda x: np.zeros(x.shape, x.dtype), tree)
    return ravel_pytree(skel)[1]


def pack_train_state(state: TrainState) -> PackedTrainState:
    from jax.flatten_util import ravel_pytree
    packed = PackedTrainState(
        params=ravel_pytree(state.params)[0],
        batch_stats=ravel_pytree(state.batch_stats)[0],
        opt_state=_pack_adam(state.opt_state),
        step=state.step)
    # defensive copies: pass-through leaves (step, Adam count) must not
    # alias `state`'s buffers — both step variants donate their input state
    return jax.tree.map(lambda x: jnp.copy(x) if hasattr(x, 'dtype') else x,
                        packed)


def unpack_train_state(packed: PackedTrainState,
                       template: TrainState) -> TrainState:
    """Back to the portable tree layout (checkpoints, eval_forward)."""
    p_unravel = _unravel_like(template.params)
    b_unravel = _unravel_like(template.batch_stats)
    return template.replace(
        params=p_unravel(packed.params),
        batch_stats=b_unravel(packed.batch_stats),
        opt_state=_unpack_adam(packed.opt_state, p_unravel),
        step=packed.step)


def make_packed_train_step(cfg: Config, template: TrainState):
    """The production single-chip train step over a PackedTrainState.

    Numerically identical to make_train_step (same loss, clip->wd->adam
    chain, BN-stat updates) — proven by
    tests/test_model.py::test_packed_train_step_matches_unpacked."""
    from jax.flatten_util import ravel_pytree
    p_unravel = _unravel_like(template.params)
    b_unravel = _unravel_like(template.batch_stats)
    apply_fn, tx = template.apply_fn, template.tx

    def train_step(packed: PackedTrainState, batch, rng
                   ) -> Tuple[PackedTrainState, Dict[str, jnp.ndarray]]:
        labels = prepare_future_labels(batch, cfg)
        model_args = batch_to_model_args(batch, cfg)
        rngs = {'dropout': rng, 'sample': jax.random.fold_in(rng, 1)}
        planning_inputs = build_planning_inputs(batch, labels, cfg)

        def loss_fn(pflat):
            (output, weights), updates = apply_fn(
                {'params': p_unravel(pflat),
                 'batch_stats': b_unravel(packed.batch_stats)},
                **model_args, planning_inputs=planning_inputs, train=True,
                rngs=rngs, mutable=['batch_stats', 'diagnostics'])
            loss_dict = compute_losses(output, labels, weights, cfg)
            return sum(loss_dict.values()), (loss_dict, updates)

        (total, (loss_dict, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(packed.params)
        upd, new_opt = tx.update(grads, packed.opt_state, packed.params)
        new_params = optax.apply_updates(packed.params, upd)
        new_bstats = ravel_pytree(updates['batch_stats'])[0]
        metrics = {'total_loss': total, **loss_dict}
        for k, v in _flatten_diagnostics(
                updates.get('diagnostics', {})).items():
            metrics[f'diag/{k}'] = v
        return (PackedTrainState(new_params, new_bstats, new_opt,
                                 packed.step + 1), metrics)

    return jax.jit(train_step, donate_argnums=(0,))


def eval_forward(state: TrainState, batch, cfg: Config, rng=None,
                 planning_inputs=None):
    """Inference forward pass (running BN stats, no dropout).

    Static-capacity drop counters from the sparse engines come back under
    ``output['diagnostics']`` (absent when no engine sowed any)."""
    model_args = batch_to_model_args(batch, cfg)
    rngs = {'sample': rng if rng is not None else jax.random.PRNGKey(0)}
    (output, _), updates = state.apply_fn(
        {'params': state.params, 'batch_stats': state.batch_stats},
        **model_args, planning_inputs=planning_inputs, train=False,
        rngs=rngs, mutable=['diagnostics'])
    diag = _flatten_diagnostics(updates.get('diagnostics', {}))
    if diag:
        output['diagnostics'] = diag
    return output
