"""Render parity: the exact colormap formulas and scale factors of
``fs/fluid_simulator.py:38-58,121-126`` / ``fs/visualization.py``."""

import numpy as np
import jax.numpy as jnp

from fluid2d_tpu.config import SimConfig
from fluid2d_tpu.scenes.compile import get_scene
from fluid2d_tpu.state import init_state
from fluid2d_tpu.utils.viz import render_rgb, to_image

RNG = np.random.default_rng(1)


def _setup():
    res = 16
    scene = get_scene(1, res)
    cfg = SimConfig.create(resolution=res, scheme="cip", enable_dye=True)
    state = init_state(scene, cfg)._replace(
        v=jnp.asarray(RNG.standard_normal((2, 32, 16)).astype(np.float32)),
        p=jnp.asarray(RNG.standard_normal((32, 16)).astype(np.float32)),
        dye=jnp.asarray(RNG.random((3, 32, 16)).astype(np.float32)),
    )
    return state, scene, cfg


def test_norm_plus_pressure_view():
    state, scene, cfg = _setup()
    rgb = np.asarray(render_rgb(state, scene, cfg, 0))
    v = np.asarray(state.v)
    p = np.asarray(state.p)
    norm = np.sqrt(v[0] ** 2 + v[1] ** 2)
    expected = 0.2 * norm[..., None] * np.ones(3) + 0.002 * np.stack(
        [np.maximum(p, 0), np.zeros_like(p), np.maximum(-p, 0)], axis=-1
    )
    fl = ~np.asarray(scene.wall)
    np.testing.assert_allclose(rgb[fl], expected[fl].astype(np.float32), atol=1e-6)


def test_pressure_view_scale():
    state, scene, cfg = _setup()
    rgb = np.asarray(render_rgb(state, scene, cfg, 1))
    p = np.asarray(state.p)
    fl = ~np.asarray(scene.wall)
    np.testing.assert_allclose(rgb[..., 0][fl], (0.04 * np.maximum(p, 0))[fl], atol=1e-6)
    np.testing.assert_allclose(rgb[..., 2][fl], (0.04 * np.maximum(-p, 0))[fl], atol=1e-6)
    assert (rgb[..., 1][fl] == 0).all()


def test_vorticity_view_scale():
    from tests.oracle import diff_x, diff_y

    state, scene, cfg = _setup()
    rgb = np.asarray(render_rgb(state, scene, cfg, 2))
    v = np.moveaxis(np.asarray(state.v), 0, -1)
    wall = np.asarray(scene.wall)
    for i, j in [(5, 7), (16, 8), (30, 3)]:
        if wall[i, j]:
            continue
        curl = diff_x(v, i, j, cfg.dx)[1] - diff_y(v, i, j, cfg.dx)[0]
        np.testing.assert_allclose(rgb[i, j, 0], 0.005 * max(curl, 0.0), atol=1e-6)
        np.testing.assert_allclose(rgb[i, j, 2], 0.005 * max(-curl, 0.0), atol=1e-6)


def test_dye_view_is_raw():
    state, scene, cfg = _setup()
    rgb = np.asarray(render_rgb(state, scene, cfg, 3))
    dye = np.moveaxis(np.asarray(state.dye), 0, -1)
    fl = ~np.asarray(scene.wall)
    np.testing.assert_array_equal(rgb[fl], dye[fl])


def test_to_image_orientation():
    """(X, Y) grid → screen image: row 0 at the TOP is max-y, x runs
    right — matching the reference's window orientation."""
    rgb = np.zeros((4, 3, 3), np.float32)
    rgb[0, 2] = 1.0  # x=0, y=max
    img = to_image(rgb)
    assert img.shape == (3, 4, 3)  # H=Y, W=X
    assert (img[0, 0] == 255).all()  # top-left pixel
