"""RL state-space experiment tests (SURVEY.md section 2 row 17 / section 3.3,
3.5): state count in the reference's measured ballpark, deterministic
rendering, red-band semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

import small_pathtracer_tpu as spt
from small_pathtracer_tpu.experiment.state_space import (
    _red_band,
    create_state_space,
    render_state_viz,
    state_color,
    state_key,
)


@pytest.fixture(scope="module")
def scene():
    return spt.get_scene("cornell_box")


def test_state_count_ballpark(scene):
    """Reference measured 977 states on the box scene (SURVEY section 3.3).
    Our per-orientation quantization differs in color/rounding details, so
    assert the same order of magnitude, deterministically."""
    n1 = create_state_space(scene)
    assert 400 <= n1 <= 4000, n1
    assert create_state_space(scene) == n1


def test_viz_renders_red_and_colors(scene):
    cam = spt.make_camera()
    img, n_red = render_state_viz(scene, cam, 96, 96)
    img = np.asarray(img)
    assert img.shape == (96, 96, 3)
    assert n_red > 0  # grid-crossing bands visible (COUNTER RED > 0)
    # Red pixels are pure red.
    red_mask = (img[..., 0] == 1.0) & (img[..., 1] == 0.0)
    assert red_mask.sum() == n_red
    # Non-red states have varied colors (a real false-color map).
    assert len(np.unique(img.round(3).reshape(-1, 3), axis=0)) > 20


def test_red_band_formula():
    key = jnp.asarray([[1.0, 2.0, 3.0]])
    # Voxel centers at 5, 15, 25: a point near (5, 15, 0) crosses 2 axes.
    x = jnp.asarray([[5.2, 14.8, 0.0]])
    assert bool(_red_band(key, x)[0])
    x2 = jnp.asarray([[5.2, 10.0, 0.0]])  # only one axis near a center
    assert not bool(_red_band(key, x2)[0])


def test_state_key_orientation(scene):
    # Floor hit (object 4, axis y): y component stays raw/10, x/z ceil.
    obj = jnp.asarray([4], jnp.int32)
    x = jnp.asarray([[53.0, 0.0, 117.0]])
    k = np.asarray(state_key(scene, obj, x))[0]
    assert k[0] == np.ceil(53.0 / 10)
    assert k[1] == 0.0
    assert k[2] == np.ceil(117.0 / 10)


def test_state_color_deterministic_range(scene):
    key = jnp.asarray([[6.0, 2.0, 7.0], [1.0, 8.0, 3.0]])
    c1 = np.asarray(state_color(key))
    c2 = np.asarray(state_color(key))
    np.testing.assert_array_equal(c1, c2)
    assert c1.min() >= 0.0 and c1.max() <= 1.0
    assert not np.allclose(c1[0], c1[1])
