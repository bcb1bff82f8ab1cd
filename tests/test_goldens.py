"""Golden-image regression: the committed goldens/ renders must reproduce
exactly on the CPU test backend (deterministic: fixed seed + counter RNG).

This is the rebuild's version of the reference's committed-PPM workflow
(SURVEY.md section 4.1) — except ours are actually reproducible."""

from pathlib import Path

import numpy as np
import pytest

import small_pathtracer_tpu as spt
from small_pathtracer_tpu.core import film

GOLDENS = Path(__file__).resolve().parent.parent / "goldens"

CASES = [
    ("cornell_box", "nee"),
    ("cornell_spheres", "nee"),
    ("smallpt_original", "cosine"),
]


@pytest.mark.parametrize("name,est", CASES)
def test_golden_render(name, est):
    path = GOLDENS / f"{name}_64x48x16_{est}_seed42.ppm"
    assert path.exists(), path
    golden = film.read_ppm(str(path))
    cfg = spt.RenderConfig(width=64, height=48, spp=16, estimator=est, seed=42)
    img, _ = spt.render(
        spt.get_scene(name), spt.make_camera(aspect=64 / 48), cfg
    )
    got = np.asarray(film.tonemap_u8(img))
    # Same backend, same seed => must be exact. (Goldens were rendered on
    # the CPU backend the test suite pins.)
    np.testing.assert_array_equal(got, golden)


def test_golden_render_tent_dof():
    """Camera-extension golden: tent filter + thin-lens DoF focused at the
    near sphere (exact reproduction locks the lens/filter RNG draw sites)."""
    path = GOLDENS / "cornell_spheres_64x48x16_nee_tentdof_seed42.ppm"
    golden = film.read_ppm(str(path))
    cfg = spt.RenderConfig(width=64, height=48, spp=16, estimator="nee",
                           seed=42, pixel_filter="tent", aperture=6.0,
                           focus_dist=121.0)
    img, _ = spt.render(
        spt.get_scene("cornell_spheres"), spt.make_camera(aspect=64 / 48), cfg
    )
    np.testing.assert_array_equal(np.asarray(film.tonemap_u8(img)), golden)
