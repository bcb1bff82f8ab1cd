"""Native (C++) host-utility tests: each entry point vs its Python
reference implementation."""

import math

import numpy as np
import pytest

from small_pathtracer_tpu import native
from small_pathtracer_tpu.core import rng

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="g++ unavailable; native lib not built"
)


def test_ppm_body_format(rng_np):
    vals = rng_np.integers(0, 256, size=300, dtype=np.uint8)
    body = native.ppm_body(vals)
    expect = ("".join(f"{v} " for v in vals)).encode()
    assert body == expect


def test_tonemap_matches_contract_c2(rng_np):
    x = rng_np.uniform(-0.2, 1.4, size=1000).astype(np.float32)
    got = native.tonemap_u8(x)
    expect = np.asarray(
        [int(math.pow(min(max(float(v), 0.0), 1.0), 1 / 2.2) * 255 + 0.5)
         for v in x],
        np.uint8,
    )
    np.testing.assert_array_equal(got, expect)


def test_erand48_matches_python_lcg():
    s0 = int(rng.rand48_seed_row(7))
    got, s_end = native.erand48(s0, 64)
    expect, s_end_py = rng.erand48_sequence(np.uint64(s0), 64)
    np.testing.assert_array_equal(got, expect)
    assert s_end == int(s_end_py)


def test_write_ppm_uses_native_and_roundtrips(tmp_path, rng_np):
    from small_pathtracer_tpu.core import film

    img = rng_np.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    p = tmp_path / "n.ppm"
    film.write_ppm(str(p), img)
    np.testing.assert_array_equal(film.read_ppm(str(p)), img)
