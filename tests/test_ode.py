"""GRU-ODE tape semantics tests.

Timeline behaviours verified against the reference control flow
(temporal_ode_bayes.py:479-627): observation jumps, variable-step gap
consumption, fixed-step integration, per-target path selection, and
per-sample timestamp independence.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamingflow_tpu.layers.ode import GRUODEBayes

KEY = jax.random.PRNGKey(0)
HW = 8      # BEV size (tiny, encodes to 2x2 latent)
C = 8


def make_model(**kw):
    defaults = dict(input_size=C, hidden_size=C, delta_t=0.5,
                    srvp_filter_size=4, stochastic=False,
                    max_gap_seconds=1.0)
    defaults.update(kw)
    return GRUODEBayes(**defaults)


def make_inputs(n_obs=3, n_tgt=2, B=1):
    rng = np.random.RandomState(0)
    obs_times = np.tile(np.linspace(-1.0, 0.0, n_obs, dtype=np.float32),
                        (B, 1))
    target_times = np.tile(
        np.arange(1, n_tgt + 1, dtype=np.float32) * 0.5, (B, 1))
    obs = rng.randn(B, n_obs, HW, HW, C).astype(np.float32)
    inp = rng.randn(B, 1, HW, HW, C).astype(np.float32)
    return (jnp.asarray(obs_times), jnp.asarray(obs), jnp.asarray(inp),
            jnp.asarray(target_times))


@pytest.mark.parametrize('variable_step', [False, True])
def test_shapes(variable_step):
    m = make_model(variable_step=variable_step)
    args = make_inputs()
    v = m.init({'params': KEY, 'dropout': KEY, 'sample': KEY}, *args)
    out = m.apply(v, *args)
    assert out.shape == (1, 2, HW, HW, C)
    assert np.isfinite(np.asarray(out)).all()


def test_deterministic_mode_reproducible():
    m = make_model(variable_step=True)
    args = make_inputs()
    v = m.init({'params': KEY, 'dropout': KEY, 'sample': KEY}, *args)
    a = m.apply(v, *args)
    b = m.apply(v, *args)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_past_targets_select_jump_states():
    """A target exactly at an observation time must decode the post-jump
    state recorded at that observation (reference :610-621 selection)."""
    m = make_model(variable_step=True)
    obs_times, obs, inp, _ = make_inputs(n_obs=3, n_tgt=2)
    # target at the middle observation and at the last observation
    target_times = jnp.asarray([[-0.5, 0.0]])
    v = m.init({'params': KEY, 'dropout': KEY, 'sample': KEY},
               obs_times, obs, inp, target_times)
    out = m.apply(v, obs_times, obs, inp, target_times)

    # compare against future targets: states must differ
    future_targets = jnp.asarray([[0.5, 1.0]])
    out_future = m.apply(v, obs_times, obs, inp, future_targets)
    assert not np.allclose(np.asarray(out), np.asarray(out_future))


def test_observation_jump_changes_state():
    """With vs without a final observation the prediction must differ."""
    m = make_model(variable_step=True)
    obs_times, obs, inp, target_times = make_inputs(n_obs=3, n_tgt=2)
    v = m.init({'params': KEY, 'dropout': KEY, 'sample': KEY},
               obs_times, obs, inp, target_times)
    out_a = m.apply(v, obs_times, obs, inp, target_times)
    obs_b = obs.at[:, -1].set(obs[:, -1] * 5.0 + 1.0)
    out_b = m.apply(v, obs_times, obs_b, inp, target_times)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_batch_samples_independent():
    """Each batch sample has its own timeline; permuting sample 1's times
    must not change sample 0's output."""
    m = make_model(variable_step=True)
    rng = np.random.RandomState(1)
    obs_times = jnp.asarray(np.stack([
        np.linspace(-1.0, 0.0, 3), np.linspace(-0.8, 0.0, 3)]).astype(np.float32))
    obs = jnp.asarray(rng.randn(2, 3, HW, HW, C).astype(np.float32))
    inp = jnp.asarray(rng.randn(2, 1, HW, HW, C).astype(np.float32))
    tt = jnp.asarray([[0.5, 1.0], [0.25, 0.75]], jnp.float32)
    v = m.init({'params': KEY, 'dropout': KEY, 'sample': KEY},
               obs_times, obs, inp, tt)
    out = m.apply(v, obs_times, obs, inp, tt)

    tt2 = tt.at[1].set(jnp.asarray([0.1, 2.0]))
    out2 = m.apply(v, obs_times, obs, inp, tt2)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out2[0]))
    assert not np.allclose(np.asarray(out[1]), np.asarray(out2[1]))


def _time_probe(mdl, obs_times, obs, inp, target_times):
    """Drive one obs event + one target event and expose the integration
    clock: in fixed-step mode the clock advances delta_t per *effective*
    step, so final times directly encode the step counts of the reference
    while-loops (temporal_ode_bayes.py:539-549, :585-593)."""
    hx = mdl.srvp_encoder(obs[:, 0], train=False)
    inp_enc = mdl.srvp_encoder(inp[:, 0], train=False)
    state = jnp.zeros_like(inp_enc)
    t0 = jnp.min(obs_times, axis=1)
    carry, _ = mdl._obs_event((state, inp_enc, t0),
                              (obs_times[:, 0], hx), False)
    t_after_obs = carry[2]
    carry, (_, rec_time, rec_valid) = mdl._target_event(
        carry, target_times[:, 0], False)
    return t_after_obs, carry[2], rec_time, rec_valid


def _run_probe(m, t_target=2.0):
    rng = np.random.RandomState(2)
    obs_times = jnp.asarray([[0.0]])
    obs = jnp.asarray(rng.randn(1, 1, HW, HW, C).astype(np.float32))
    inp = jnp.asarray(rng.randn(1, 1, HW, HW, C).astype(np.float32))
    tt = jnp.asarray([[t_target]])
    v = m.init({'params': KEY, 'dropout': KEY, 'sample': KEY},
               obs_times, obs, inp, tt)
    out = m.apply(v, obs_times, obs, inp, tt, method=_time_probe,
                  rngs={'sample': KEY})
    return [np.asarray(x) for x in out]


def test_fixed_step_counts_match_reference_loop():
    """Fixed-step mode: obs at t=0 -> 0 steps; target at t=2.0 with
    delta_t=0.5 -> exactly 4 Euler steps (clock lands exactly on 2.0),
    matching the reference loop iteration count (ref :539-549, :585-593)."""
    m = make_model(variable_step=False, delta_t=0.5, max_gap_seconds=2.0)
    t_obs, t_final, rec_time, rec_valid = _run_probe(m)
    np.testing.assert_allclose(t_obs, [0.0])          # no pre-obs stepping
    np.testing.assert_allclose(t_final, [2.0])        # 4 x 0.5, not 3 or 5
    assert bool(rec_valid[0])
    np.testing.assert_allclose(rec_time, [2.0], atol=1e-6)


def test_fixed_step_capped_by_substep_budget():
    """The static tape allocates ceil(max_gap/delta_t) sub-steps per event;
    a gap larger than max_gap runs exactly that many effective steps (the
    clock stops at max_gap) — proving the masked sub-steps are real steps,
    not no-ops."""
    m = make_model(variable_step=False, delta_t=0.5, max_gap_seconds=1.0)
    _, t_final, _, rec_valid = _run_probe(m, t_target=2.0)
    np.testing.assert_allclose(t_final, [1.0])        # 2 substeps x 0.5
    assert not bool(rec_valid[0])                     # never reached window


def test_variable_step_consumes_gap_in_one_step():
    """Variable-step mode integrates obs->target gaps in a single step of
    size gap (ref :546-549): the clock jumps straight to the target."""
    m = make_model(variable_step=True, delta_t=0.5, max_gap_seconds=2.0)
    t_obs, t_final, rec_time, rec_valid = _run_probe(m)
    np.testing.assert_allclose(t_obs, [0.0])
    np.testing.assert_allclose(t_final, [2.0])
    assert bool(rec_valid[0])


@pytest.mark.parametrize('solver', ['euler', 'midpoint'])
def test_solvers(solver):
    m = make_model(variable_step=True, solver=solver)
    args = make_inputs()
    v = m.init({'params': KEY, 'dropout': KEY, 'sample': KEY}, *args)
    out = m.apply(v, *args)
    assert np.isfinite(np.asarray(out)).all()


def test_gradients_flow():
    m = make_model(variable_step=True)
    args = make_inputs()
    v = m.init({'params': KEY, 'dropout': KEY, 'sample': KEY}, *args)

    def loss(params):
        out = m.apply({'params': params, **{k: v[k] for k in v if k != 'params'}},
                      *args)
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(v['params'])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # at least the observation-jump cell must receive gradient
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_long_horizon_8s_variable_step():
    """The streaming capability: free-run to an 8 s horizon (16 frames at
    0.5 s) with no retraining — variable step consumes each gap in one
    event (reference README.md:82 horizon table)."""
    model = make_model(variable_step=True, delta_t=0.05)
    n_tgt = 16
    obs_times, obs, inp, _ = make_inputs(n_obs=3, n_tgt=2)
    target_times = jnp.asarray(
        np.arange(1, n_tgt + 1, dtype=np.float32)[None] * 0.5)
    variables = model.init({'params': KEY, 'sample': KEY},
                           obs_times, obs, inp, target_times)
    out = model.apply(variables, obs_times, obs, inp, target_times,
                      rngs={'sample': KEY})
    assert out.shape == (1, n_tgt, HW, HW, C)
    assert np.isfinite(np.asarray(out)).all()
    # later horizons integrate further: states must keep evolving
    assert not np.allclose(np.asarray(out[:, 0]), np.asarray(out[:, -1]))


def test_sub_keyframe_0p05s_interval_targets():
    """Streaming eval at the 0.05 s lattice: 30 targets on a dense grid
    decode from one trained model (reference evaluate_streaming.py:118-126)."""
    model = make_model(variable_step=True, delta_t=0.05)
    obs_times, obs, inp, _ = make_inputs(n_obs=3, n_tgt=2)
    target_times = jnp.asarray(
        (np.arange(30, dtype=np.float32)[None] + 1) * 0.05)
    variables = model.init({'params': KEY, 'sample': KEY},
                           obs_times, obs, inp, target_times)
    out = model.apply(variables, obs_times, obs, inp, target_times,
                      rngs={'sample': KEY})
    assert out.shape[1] == 30
    assert np.isfinite(np.asarray(out)).all()
    # consecutive 0.05 s targets differ (fresh integration per event, not a
    # single nearest-state repeated)
    diffs = np.abs(np.diff(np.asarray(out), axis=1)).mean(axis=(0, 2, 3, 4))
    assert (diffs > 0).all()
