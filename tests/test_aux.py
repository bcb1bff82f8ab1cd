"""Auxiliary subsystem tests: launcher retry logic, profiling, imageio."""

import numpy as np
import pytest

import small_pathtracer_tpu as spt


def test_distributed_render_single_process():
    from small_pathtracer_tpu.parallel.launcher import distributed_render

    cfg = spt.RenderConfig(width=24, height=16, spp=8, estimator="nee")
    img, traces = distributed_render(
        spt.get_scene("cornell_box"), spt.make_camera(aspect=1.5), cfg
    )
    assert img.shape == (16, 24, 3)
    assert traces > 0


def test_launcher_retries_then_raises(monkeypatch):
    import small_pathtracer_tpu.parallel.launcher as L

    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("injected")

    monkeypatch.setattr(L, "render_sharded", boom)
    cfg = spt.RenderConfig(width=8, height=8, spp=8)
    with pytest.raises(RuntimeError, match="failed after 3 attempts"):
        L.distributed_render(
            spt.get_scene("cornell_box"), spt.make_camera(), cfg,
            max_retries=2, retry_delay_s=0.0,
        )
    assert calls["n"] == 3


def test_phase_timer():
    from small_pathtracer_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    rep = t.report()
    assert "a" in rep and "b" in rep


def test_imageio_png_roundtrip(tmp_path, rng_np):
    from small_pathtracer_tpu.core.imageio import read_image, write_image

    img = rng_np.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    write_image(str(p), img)
    np.testing.assert_array_equal(read_image(str(p)), img)
