"""GRU-ODE with Bayesian jumps, compiled as a static-shape step tape.

TPU-native re-design of reference streamingflow/layers/temporal_ode_bayes.py
(NNFOwithBayesianJumps:355).  The reference drives the integration with
data-dependent Python ``while`` loops over observation/target timestamps; here
the timeline becomes a *static event tape*: ``E_obs`` observation events
followed by ``E_tgt`` target events, each expanded into ``K`` solver sub-steps
(K = 1 in variable-step mode, where one Euler step consumes the whole gap,
reference :546-549; K = ceil(max_gap / delta_t) in fixed-step mode).  All
data-dependence (per-sample timestamps) is expressed with per-sample masks, so
the compiled program is identical for every batch element and the GRU convs
stay batched on the MXU.

Path-recording / target-selection semantics replicate reference :578-621:
observation events record the post-jump state at the observation time; target
events record every in-window (+-delta_t/2) integration step, latest winning;
the final per-target state is the latest in-window record across the path,
falling back to the nearest recorded time.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .srvp import ConvNet, SmallDecoder, SmallEncoder
from .temporal import DualGRUCell


def softplus_rsample(raw_params: jnp.ndarray, rng: Optional[jax.Array],
                     eps: float = 1e-8) -> jnp.ndarray:
    """Sample N(loc, softplus(raw_scale)+eps) split on the channel axis.

    Reference: models/model_utils.py:60-109 (rsample_normal).  With ``rng``
    None the mean is returned (deterministic mode)."""
    loc, raw_scale = jnp.split(raw_params, 2, axis=-1)
    if rng is None:
        return loc
    scale = jax.nn.softplus(raw_scale) + eps
    return loc + scale * jax.random.normal(rng, loc.shape, loc.dtype)


class GRUODEBayes(nn.Module):
    """NNFOwithBayesianJumps on a static tape.

    Call signature (batched; times in seconds relative to the present frame):
      obs_times    (B, E_obs)           sorted observation times
      obs          (B, E_obs, H, W, C)  BEV observations (full 200x200 space)
      inp          (B, 1, H, W, C)      present state (shapes the latent init)
      target_times (B, E_tgt)
    Returns decoded per-target states (B, E_tgt, H, W, C).

    Reference: temporal_ode_bayes.py:355-627.
    """
    input_size: int
    hidden_size: int
    delta_t: float
    solver: str = 'euler'
    impute: bool = False
    variable_step: bool = False
    srvp_filter_size: int = 64
    skipco: bool = False
    max_gap_seconds: float = 0.6
    stochastic: bool = True

    def setup(self):
        self.gru_c = DualGRUCell(self.input_size, self.hidden_size,
                                 return_delta=True)
        self.gru_obs = DualGRUCell(self.input_size, self.hidden_size,
                                   return_delta=False)
        self.p_model = ConvNet(self.hidden_size * 2)
        self.srvp_encoder = SmallEncoder(self.input_size, self.srvp_filter_size)
        self.srvp_decoder = SmallDecoder(self.input_size, self.srvp_filter_size,
                                         skip=self.skipco)

    # ------------------------------------------------------------------ pieces
    def _infer_state(self, state, train):
        params = self.p_model(state, train=train)
        rng = self.make_rng('sample') if self.stochastic else None
        return softplus_rsample(params, rng)

    def _dh(self, inp, state, train):
        if not self.impute:
            inp = jnp.zeros_like(inp)  # ref :442-443
        return self.gru_c(inp, state, train=train)

    def _ode_step(self, state, inp, dt_b, train):
        """One solver step; dt_b is (B, 1, 1, 1). Reference :436-459."""
        if self.solver == 'euler':
            state = state + dt_b * self._dh(inp, state, train)
            inp = self._infer_state(state, train)
        elif self.solver == 'midpoint':
            k = state + dt_b / 2 * self._dh(inp, state, train)
            pk = self._infer_state(k, train)
            state = state + dt_b * self._dh(pk, k, train)
            inp = self._infer_state(state, train)
        else:
            raise ValueError(f'Unknown solver {self.solver}')
        return state, inp

    def _masked_substep(self, state, inp, current_time, event_time, is_obs,
                        train):
        """One masked sub-step toward ``event_time`` (per-sample gating)."""
        gap = event_time - current_time
        # obs phase (ref :541): step while current_time <= obs_time - delta_t
        # target phase (ref :586): step while current_time < predict_time
        do_step = gap >= self.delta_t if is_obs else gap > 0.0
        if self.variable_step:
            dt = jnp.maximum(gap, 0.0)
        else:
            dt = jnp.full_like(gap, self.delta_t)
        dt = jnp.where(do_step, dt, 0.0)
        dt_b = dt[:, None, None, None].astype(state.dtype)
        new_state, new_inp = self._ode_step(state, inp, dt_b, train)
        mask = do_step[:, None, None, None]
        state = jnp.where(mask, new_state, state)
        inp = jnp.where(mask, new_inp, inp)
        return state, inp, current_time + dt, do_step

    # --------------------------------------------------------------- events
    def _n_substeps(self) -> int:
        return 1 if self.variable_step else max(
            1, int(-(-self.max_gap_seconds // self.delta_t)))

    def _obs_event(self, carry, x, train: bool):
        """Integrate up to one observation, then jump (ref :539-581)."""
        state, inp_enc, current_time = carry
        etime, hx = x
        for _ in range(self._n_substeps()):
            state, inp_enc, current_time, _ = self._masked_substep(
                state, inp_enc, current_time, etime, True, train)
        dt0 = carry[0].dtype
        state = self.gru_obs(hx, state, train=train)        # ref :565
        inp_enc = self._infer_state(state, train)           # ref :574
        # norm layers may upcast to fp32 internally; the scan carry dtype
        # must stay fixed (bf16 under mixed precision)
        state, inp_enc = state.astype(dt0), inp_enc.astype(dt0)
        return (state, inp_enc, current_time), (state, etime)

    def _target_event(self, carry, ttime, train: bool):
        """Free-run toward one target time, recording in-window states
        (ref :585-604)."""
        state, inp_enc, current_time = carry
        half = 0.5 * self.delta_t
        rec_state = jnp.zeros_like(state)
        rec_time = jnp.full(current_time.shape, jnp.inf, current_time.dtype)
        rec_valid = jnp.zeros(current_time.shape, bool)
        for _ in range(self._n_substeps()):
            state, inp_enc, current_time, stepped = self._masked_substep(
                state, inp_enc, current_time, ttime, False, train)
            in_win = (stepped & (current_time > ttime - half)
                      & (current_time < ttime + half))
            m = in_win[:, None, None, None]
            rec_state = jnp.where(m, state, rec_state)
            rec_time = jnp.where(in_win, current_time, rec_time)
            rec_valid = rec_valid | in_win
        rec_time = jnp.where(rec_valid, rec_time, jnp.inf)
        dt0 = carry[0].dtype
        state, inp_enc = state.astype(dt0), inp_enc.astype(dt0)
        return ((state, inp_enc, current_time),
                (rec_state.astype(dt0), rec_time, rec_valid))

    # ------------------------------------------------------------------- main
    def __call__(self, obs_times, obs, inp, target_times, train: bool = False):
        """The event tape executes under ``nn.scan``: one compiled event body
        instead of E_obs + E_tgt unrolled copies (params broadcast, BN stats
        threaded through the scan carry — same sequential update order as an
        unrolled loop — and per-event 'sample' rngs)."""
        B, E_obs = obs_times.shape
        E_tgt = target_times.shape[1]

        def encode_seq(x):
            b, t = x.shape[:2]
            flat = x.reshape(b * t, *x.shape[2:])
            enc = self.srvp_encoder(flat, train=train)
            return enc.reshape(b, t, *enc.shape[1:])

        hx_obs = encode_seq(obs)           # (B, E_obs, h, w, c)
        inp_enc = encode_seq(inp)[:, 0]    # (B, h, w, c)

        state = jnp.zeros_like(inp_enc)              # ref :507 zero init
        current_time = jnp.min(obs_times, axis=1)    # ref :508
        half = 0.5 * self.delta_t

        if self.is_initializing():
            # Variables carried through the scan (BN stats) must exist before
            # scanning: create every event variable with one unscanned body
            # call, broadcasting outputs to the tape length for shape flow.
            carry, (s1, t1) = self._obs_event(
                (state, inp_enc, current_time),
                (obs_times[:, 0], hx_obs[:, 0]), train)
            obs_states = jnp.repeat(s1[:, None], E_obs, axis=1)
            obs_t = jnp.repeat(t1[:, None], E_obs, axis=1)
            carry, (r1, rt1, rv1) = self._target_event(
                carry, target_times[:, 0], train)
            rec_states = jnp.repeat(r1[:, None], E_tgt, axis=1)
            rec_times = jnp.repeat(rt1[:, None], E_tgt, axis=1)
            rec_valids = jnp.repeat(rv1[:, None], E_tgt, axis=1)
        else:
            # train: BN stats are mutable -> thread them through the scan
            # carry (sequential updates, like an unrolled loop).  eval: stats
            # are read-only -> broadcast them alongside params.
            if self.is_mutable_collection('batch_stats'):
                var_kw = dict(variable_broadcast='params',
                              variable_carry='batch_stats')
            else:
                var_kw = dict(variable_broadcast=['params', 'batch_stats'])
            scan_kw = dict(**var_kw,
                           split_rngs={'params': False, 'sample': True,
                                       'dropout': True},
                           in_axes=1, out_axes=1)

            obs_scan = nn.scan(
                lambda mdl, c, x: mdl._obs_event(c, x, train), **scan_kw)
            carry, (obs_states, obs_t) = obs_scan(
                self, (state, inp_enc, current_time), (obs_times, hx_obs))

            tgt_scan = nn.scan(
                lambda mdl, c, x: mdl._target_event(c, x, train), **scan_kw)
            _, (rec_states, rec_times, rec_valids) = tgt_scan(
                self, carry, target_times)

        path_states = jnp.concatenate([obs_states, rec_states], axis=1)
        path_times = jnp.concatenate([obs_t, rec_times], axis=1)
        path_valid = jnp.concatenate(
            [jnp.ones((B, E_obs), bool), rec_valids], axis=1)
        E = E_obs + E_tgt
        idx_arange = jnp.arange(E)

        # --- per-target selection (ref :610-621) -----------------------------
        def select(pt, pv, tt):
            in_win = pv & (pt > tt - half) & (pt < tt + half)
            has_win = jnp.any(in_win)
            idx_win = jnp.argmax(jnp.where(in_win, idx_arange, -1))
            dist = jnp.where(pv, jnp.abs(pt - tt), jnp.inf)
            idx_near = jnp.argmin(dist)
            return jnp.where(has_win, idx_win, idx_near)

        sel = jax.vmap(
            lambda pt, pv, tts: jax.vmap(lambda tt: select(pt, pv, tt))(tts)
        )(path_times, path_valid, target_times)        # (B, E_tgt)

        x = jnp.take_along_axis(
            path_states, sel[:, :, None, None, None], axis=1)

        b, t = x.shape[:2]
        flat = x.reshape(b * t, *x.shape[2:])
        dec = self.srvp_decoder(flat, train=train)
        return dec.reshape(b, t, *dec.shape[1:])
