"""Patch-pool lift-splat kernel vs the scatter reference backend.

The structural Pallas pooling (ops/pallas_patch_pool.py) must reproduce the
XLA segment-sum exactly (up to fp32 reassociation) on camera-like geometry,
and must *count* rows it drops when a group violates the patch budget.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamingflow_tpu import geometry as G
from streamingflow_tpu.ops import lift_splat as LS
from streamingflow_tpu.ops.pallas_patch_pool import (PATCH_H, PATCH_W,
                                                     patch_pool_frames)

NX = NY = 48
RES = jnp.asarray([0.5, 0.5, 20.0])
START = jnp.asarray([-11.75, -11.75, 0.0])
DIM = (NX, NY, 1)


def _camera_like_inputs(seed=0, n_cam=2, d=6, fh=4, fw=8):
    """Frustum features + geometry from plausible pinhole cameras.

    Focal length chosen so a 4-feature-column block spans ~5 degrees —
    the same per-block angle as the flagship setup (nuScenes fx~1266 at
    1600 px, resize 0.3, feature stride 8), which is what bounds the
    patch footprint."""
    rng = np.random.RandomState(seed)
    frustum = G.create_frustum((fh * 8, fw * 8), 8, (2.0, 2.0 + d, 1.0))
    intr = np.array([[[380.0, 0, fw * 4], [0, 380.0, fh * 4], [0, 0, 1]]] *
                    n_cam, np.float32)
    extr = []
    for i in range(n_cam):
        yaw = 2 * np.pi * i / n_cam + 0.2
        c, s = np.cos(yaw), np.sin(yaw)
        # camera->ego: optical axis along heading, slight pitch/roll noise
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = np.array([[c, 0, s], [s, 0, -c], [0, -1, 0]],
                             np.float32) @ _small_rot(rng)
        E[:3, 3] = [0.5 * c, 0.5 * s, 1.5]
        extr.append(E)
    geom = G.get_geometry(jnp.asarray(frustum),
                          jnp.asarray(intr)[None],
                          jnp.asarray(np.stack(extr))[None])[0]
    x = rng.randn(n_cam, d, fh, fw, 64).astype(np.float32)
    return jnp.asarray(x), geom  # (N, D, fh, fw, 64/3)


def _small_rot(rng):
    a, b = rng.uniform(-0.03, 0.03, 2)
    Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                   [0, np.sin(a), np.cos(a)]], np.float32)
    Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0],
                   [-np.sin(b), 0, np.cos(b)]], np.float32)
    return Rx @ Ry


def _scatter_reference(x, geom):
    flat_x = x.reshape(-1, x.shape[-1])
    flat_g = geom.reshape(-1, 3)
    return LS.bev_pool(flat_x, flat_g, START, RES, DIM, backend='scatter')


def _patch(x, geom):
    coords = LS.quantize_geometry(geom, START, RES)
    kept = ((coords[..., 0] >= 0) & (coords[..., 0] < NX)
            & (coords[..., 1] >= 0) & (coords[..., 1] < NY)
            & (coords[..., 2] >= 0) & (coords[..., 2] < 1))
    return patch_pool_frames(x[None], coords[..., :2][None], kept[None],
                             NX, NY, interpret=True)


def test_matches_scatter_on_camera_geometry():
    x, geom = _camera_like_inputs()
    # the packed kernel layout rides bf16 feature lanes (fp32 accumulation);
    # quantize the reference input identically so the comparison isolates
    # the pooling itself (exact up to fp32 reassociation)
    x_q = x.astype(jnp.bfloat16).astype(jnp.float32)
    want = np.asarray(_scatter_reference(x_q, geom))
    got, drops = _patch(x, geom)
    assert float(drops[0]) == 0.0, 'patch budget must hold for cameras'
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=1e-5,
                               atol=1e-5)


def test_all_rows_out_of_range():
    x, geom = _camera_like_inputs(seed=1)
    geom = geom + 1000.0                     # everything outside the grid
    got, drops = _patch(x, geom)
    assert float(drops[0]) == 0.0
    np.testing.assert_array_equal(np.asarray(got[0]),
                                  np.zeros((NX, NY, 64), np.float32))


def test_gradients_match_scatter_backend():
    """The custom VJP (gather of the output cotangent at each row's bin)
    must agree with autodiff through the XLA segment-sum backend — the pool
    is linear, so the grads are equal exactly (VERDICT r3 item 1a)."""
    x, geom = _camera_like_inputs(seed=2)
    coords = LS.quantize_geometry(geom, START, RES)
    kept = ((coords[..., 0] >= 0) & (coords[..., 0] < NX)
            & (coords[..., 1] >= 0) & (coords[..., 1] < NY)
            & (coords[..., 2] >= 0) & (coords[..., 2] < 1))
    rng = np.random.RandomState(7)
    w = jnp.asarray(rng.randn(NX, NY, 64).astype(np.float32))

    def loss_patch(x):
        out, _ = patch_pool_frames(x[None], coords[..., :2][None],
                                   kept[None], NX, NY, interpret=True)
        return jnp.sum(out[0] * w)

    def loss_scatter(x):
        return jnp.sum(_scatter_reference(x, geom) * w)

    g_patch = jax.grad(loss_patch)(x)
    g_scatter = jax.grad(loss_scatter)(x)
    np.testing.assert_allclose(np.asarray(g_patch), np.asarray(g_scatter),
                               rtol=1e-6, atol=1e-6)


def test_budget_violation_is_counted_not_silent():
    """Scattered random coords inside one group exceed the 16x24 patch ->
    rows must be dropped AND counted."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 1, 4, 8, 64).astype(np.float32))
    # random cells all over the grid: group spread >> patch budget
    cells = rng.randint(0, NX, (1, 1, 4, 8, 2)).astype(np.int32)
    kept = jnp.ones((1, 1, 4, 8), bool)
    got, drops = patch_pool_frames(x[None], jnp.asarray(cells)[None],
                                   kept[None], NX, NY, interpret=True)
    assert float(drops[0]) > 0.0


def test_dropped_rows_get_zero_gradient():
    """Force budget drops (VERDICT r4 item 7): the VJP must zero the
    cotangent of rows the forward dropped.  Verified against the forward
    itself via linearity — the pool is linear in x, so for any probe dx,
    <grad, dx> must equal sum(f(dx) * w); a gradient that gathers at
    dropped rows breaks this identity for probes supported on them."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 1, 4, 8, 64).astype(np.float32))
    cells = rng.randint(0, NX, (1, 1, 4, 8, 2)).astype(np.int32)
    coords = jnp.asarray(cells)
    kept = jnp.ones((1, 1, 4, 8), bool)
    w = jnp.asarray(rng.randn(NX, NY, 64).astype(np.float32))

    def pool(v):
        out, _ = patch_pool_frames(v[None], coords[None], kept[None],
                                   NX, NY, interpret=True)
        return out[0]

    _, drops = patch_pool_frames(x[None], coords[None], kept[None],
                                 NX, NY, interpret=True)
    assert float(drops[0]) > 0.0, 'scenario must force budget drops'

    g = jax.grad(lambda v: jnp.sum(pool(v) * w))(x)
    for seed in range(3):
        dx = jnp.asarray(np.random.RandomState(seed)
                         .randn(*x.shape).astype(np.float32))
        # the kernel rides bf16 feature lanes: pre-round the probe so the
        # identity is exact (pool is linear in the bf16-rounded input)
        dx = dx.astype(jnp.bfloat16).astype(jnp.float32)
        lhs = float(jnp.vdot(g, dx))
        rhs = float(jnp.sum(pool(dx) * w))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-3)

    # and directly: rows the forward dropped carry exactly zero grad
    from streamingflow_tpu.ops.pallas_patch_pool import _fits_mask
    fits = np.asarray(_fits_mask(coords[None], kept[None], NX, NY))[0]
    assert not fits.all()
    np.testing.assert_array_equal(np.asarray(g)[~fits], 0.0)


def test_boundary_clamp_keeps_edge_cells():
    """Cells at the far grid corner: window clamp must still place them."""
    x = jnp.ones((1, 1, 4, 8, 64), jnp.float32)
    cells = np.zeros((1, 1, 4, 8, 2), np.int32)
    cells[..., 0] = NX - 1
    cells[..., 1] = NY - 1
    kept = jnp.ones((1, 1, 4, 8), bool)
    got, drops = patch_pool_frames(x[None], jnp.asarray(cells)[None],
                                   kept[None], NX, NY, interpret=True)
    assert float(drops[0]) == 0.0
    assert float(got[0, NX - 1, NY - 1, 0]) == 32.0   # 4*8 ones
    assert float(np.asarray(got[0]).sum()) == 32.0 * 64
