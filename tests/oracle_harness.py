"""Oracle harness: builds and runs the C++ reference as a parity oracle.

The reference (read-only at /root/reference) is patched IN /tmp — never
copied into this repo — to:
  - remove the RL state-viz hijack that short-circuits ``radiance()`` at HEAD
    (SURVEY.md section 0: early return at smallpt.cpp:442);
  - fix the seed (``srand(time(NULL))`` is not reproducible) and decorrelate
    the per-row rand48 streams across seeds;
  - set resolution / spp;
  - select the estimator via the mixture threshold ``q < Q`` (Q=1 -> NEE,
    Q=0 -> cosine; smallpt.cpp:464) or by swapping in the commented uniform
    sampling formula (:352-360);
  - optionally fix the glibc ``rand() * 36`` int32 overflow in
    light_sampling (:365-366) to recover the intended full-range sampling
    (see small_pathtracer_tpu/integrator/sampling.py);
  - dump the raw per-pixel double accumulator to a binary file so parity is
    checked in linear space, not through the 8-bit PPM quantizer.

Skips (returns None) when /root/reference or g++ is unavailable.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
from pathlib import Path

import numpy as np

REF_SRC = Path("/root/reference/src/smallpt.cpp")
REF_HDR = Path("/root/reference/src/utilities.h")
CACHE = Path(__file__).resolve().parent / "_oracle_cache"

# The uniform-sampling body (contract C12) to swap in for the active
# cosine-weighted return; this is the commented alternative at
# smallpt.cpp:352-360, written out.
_COSINE_RETURN = (
    "return (u * cos(r1) * r2s + v * sin(r1) * r2s + w * sqrt(1 - r2)).norm();"
)
_UNIFORM_RETURN = (
    "return (u*cos(r1)*sqrt(r2*(2-r2)) + v*sin(r1)*sqrt(r2*(2-r2)) "
    "+ w*(1-r2)).norm();"
)


def available() -> bool:
    return REF_SRC.exists() and shutil.which("g++") is not None


def _enable_spec_refr(txt: str, mode: str,
                      overrides: dict | None = None) -> str:
    """Replace the commented SPEC/REFR block (smallpt.cpp:481-495, contract
    C16) with compiling code.

    The comment preserves original-smallpt syntax (``obj.refl``, ``obj.e``,
    3-arg ``radiance``, geometric normal ``n``) that no longer matches this
    reference (materials live in ``Hit_records hit``, ``radiance`` takes 6
    args, and only the ORIENTED normal ``nl`` is returned). The re-enabled
    code adapts it:
    - mirror reflection about nl == reflection about n (sign cancels);
    - ``into`` is recovered from the REFR sphere's center via an outward
      geometric-normal test; since either sphere may be REFR (and sphere 0's
      center is overridable), the test picks the NEAREST of the two scene
      sphere centers to the hit point — x lies on the refracting sphere's
      surface, so the nearest center is that sphere's;
    mode="split": the as-written estimator (trace BOTH rays at depth <= 2,
    Russian roulette beyond). mode="rr": Russian roulette at every depth
    with the same P=.25+.5*Re — the repo wavefront's always-RR variant
    (integrator/wavefront._refr_scatter); comparing the two oracle modes
    quantifies that documented deviation (it is variance-only: both are
    unbiased estimators of the same Fresnel split)."""
    idx = txt.index("else if (obj.refl == SPEC)")
    start = txt.rindex("/*", 0, idx)
    end = txt.index("*/", idx) + 2
    cond = "depth > 2" if mode == "split" else "true"
    radiance_tail = ", depth, Xi, path_length, dict, counter_red)"
    s0 = (overrides or {}).get("sphere0_center", (27.0, 16.5, 47.0))
    c0 = f"Vec({s0[0]!r}, {s0[1]!r}, {s0[2]!r})"
    c1 = "Vec(73, 16.5, 78)"
    code = f"""
\telse if (hit.refl == SPEC) {{            // Ideal SPECULAR reflection
\t\treturn hit.e + f.mult(radiance(Ray(x, r.d - nl * 2 * nl.dot(r.d)){radiance_tail});
\t}} else {{
\t\tRay reflRay(x, r.d - nl * 2 * nl.dot(r.d));     // Ideal dielectric REFRACTION
\t\tVec d0c = x - {c0}, d1c = x - {c1};  // x is ON the refracting sphere:
\t\tVec cvec = d0c.dot(d0c) < d1c.dot(d1c) ? d0c : d1c;  // nearest center
\t\tbool into = cvec.dot(nl) > 0;        // outward geometric n faces the ray?
\t\tVec n = into ? nl : nl * -1;
\t\tdouble nc = 1, nt = 1.5, nnt = into ? nc / nt : nt / nc, ddn = r.d.dot(nl), cos2t;
\t\tif ((cos2t = 1 - nnt * nnt * (1 - ddn * ddn)) < 0)    // Total internal reflection
\t\t\treturn hit.e + f.mult(radiance(reflRay{radiance_tail});
\t\tVec tdir = (r.d * nnt - n * ((into ? 1 : -1) * (ddn * nnt + sqrt(cos2t)))).norm();
\t\tdouble a = nt - nc, b = nt + nc, R0 = a * a / (b * b), cth = 1 - (into ? -ddn : tdir.dot(n));
\t\tdouble Re = R0 + (1 - R0) * cth * cth * cth * cth * cth, Tr = 1 - Re, P = .25 + .5 * Re, RP = Re / P, TP = Tr / (1 - P);
\t\treturn hit.e + f.mult({cond} ? (erand48(Xi) < P ?   // Russian roulette
\t\t\tradiance(reflRay{radiance_tail} * RP : radiance(Ray(x, tdir){radiance_tail} * TP) :
\t\t\tradiance(reflRay{radiance_tail} * Re + radiance(Ray(x, tdir){radiance_tail} * Tr);
\t}}
"""
    return txt[:start] + code + txt[end:]


def _scene_table(scene: str, overrides: dict) -> tuple[str, int]:
    """Generated C++ scene initializer (replaces smallpt.cpp:286-311).

    scene="box": the 17-rect HEAD scene, value-for-value (SURVEY 2.3).
    scene="spheres": walls + light + the two commented-out spheres
    (smallpt.cpp:297-298) instead of the boxes — 9 objects, light still
    id 6, sphere ids 7/8 (matching the repo's cornell_spheres global ids).

    overrides (all optional — the differentiable parameters of
    BASELINE.json, patched into the oracle for FD gradient parity):
      light_emission: float E -> light e = Vec(E, E, E)   [ref :294]
      right_albedo: (r, g, b) for the right wall           [ref :291]
      sphere0_center: (x, y, z) for the first sphere       [ref :297]
    """
    E = overrides.get("light_emission", 12.0)
    ra = overrides.get("right_albedo", (0.75, 0.25, 0.25))
    sc = overrides.get("sphere0_center", (27.0, 16.5, 47.0))
    mat0 = overrides.get("sphere_materials", ("DIFF", "DIFF"))
    walls = [
        "new Rectangle_xy(1, 99, 0, 81.6, 0, Vec(),Vec(.75, .75, .75), DIFF),",
        "new Rectangle_xy(1, 99, 0, 81.6, 170, Vec(), Vec(.75, .75, .75), DIFF),",
        "new Rectangle_yz(0, 81.6, 0, 170, 1, Vec(), Vec(.25, .75, .25), DIFF),",
        f"new Rectangle_yz(0, 81.6, 0, 170, 99, Vec(), "
        f"Vec({ra[0]!r}, {ra[1]!r}, {ra[2]!r}), DIFF),",
        "new Rectangle_xz(1, 99, 0, 170, 0, Vec(), Vec(.75, .75, .75), DIFF),",
        "new Rectangle_xz(1, 99, 0, 170, 81.6, Vec(), Vec(.75, .75, .75), DIFF),",
        f"new Rectangle_xz(32, 68, 63, 96, 81.5, Vec({E!r}, {E!r}, {E!r}), "
        "Vec(), DIFF),",
    ]
    if scene == "box":
        rest = [
            "new Rectangle_xy(12, 42, 0, 50, 32, Vec(), Vec(1,1,1), DIFF),",
            "new Rectangle_xy(12, 42, 0, 50, 62, Vec(), Vec(1,1,1), DIFF),",
            "new Rectangle_yz(0, 50, 32, 62, 12, Vec(), Vec(1,1,1), DIFF),",
            "new Rectangle_yz(0, 50, 32, 62, 42, Vec(), Vec(1,1,1), DIFF),",
            "new Rectangle_xz(12, 42, 32, 62, 50, Vec(), Vec(1,1,1), DIFF),",
            "new Rectangle_xy(63, 88, 0, 25, 63, Vec(), Vec(1,1,1), DIFF),",
            "new Rectangle_xy(63, 88, 0, 25, 88, Vec(), Vec(1,1,1), DIFF),",
            "new Rectangle_yz(0, 25, 63, 88, 63, Vec(), Vec(1,1,1), DIFF),",
            "new Rectangle_yz(0, 25, 63, 88, 88, Vec(), Vec(1,1,1), DIFF),",
            "new Rectangle_xz(63, 88, 63, 88, 25, Vec(), Vec(1,1,1), DIFF)",
        ]
    else:
        assert scene == "spheres", scene
        alb1 = (
            "Vec(1,1,1)*.999" if mat0[1] != "DIFF" else "Vec(.75,.75,.75)"
        )
        rest = [
            f"new Sphere(16.5, Vec({sc[0]!r}, {sc[1]!r}, {sc[2]!r}), "
            f"Vec(), Vec(1,1,1)*.999, {mat0[0]}),",
            f"new Sphere(16.5, Vec(73, 16.5, 78), Vec(), "
            f"{alb1}, {mat0[1]})",
        ]
    body = "\n\t".join(walls + rest)
    table = "Hitable *rect[NUMBER_OBJ] = {\n\t" + body + "\n};"
    return table, len(walls) + len(rest)


def _patched_source(
    width: int,
    height: int,
    spp: int,
    seed: int,
    estimator: str,
    light_mode: str,
    self_hit_eps: float = 0.0,
    scene: str = "box",
    overrides: dict | None = None,
    spec_refr: str = "",
) -> str:
    lines = REF_SRC.read_text().splitlines(keepends=True)
    # Drop the state-viz hijack block (1-based lines 424..442).
    lines = lines[:423] + lines[442:]
    txt = "".join(lines)

    if spec_refr:
        txt = _enable_spec_refr(txt, spec_refr, overrides)

    if scene != "box" or overrides:
        # Regenerate the scene table (smallpt.cpp:286-311) with parameter
        # overrides and/or the sphere-pair variant.
        start = txt.index("Hitable *rect[NUMBER_OBJ] = {")
        end = txt.index("};", start) + 2
        table, n_obj = _scene_table(scene, overrides or {})
        txt = txt[:start] + table + txt[end:]
        txt = txt.replace(
            "const int NUMBER_OBJ = 17;", f"const int NUMBER_OBJ = {n_obj};"
        )
    if scene == "spheres":
        # Sphere lacks the pure-virtual state-viz methods (only the rect
        # classes implement add_key/add_value, smallpt.cpp:126,169,212) —
        # stub them so the class is instantiable.
        ctor = (
            "Sphere(double rad_, Vec p_, Vec e_, Vec c_, Refl_t refl_) :"
            "\trad(rad_), p(p_), e(e_), c(c_), refl(refl_) {}"
        )
        assert ctor in txt
        txt = txt.replace(
            ctor,
            ctor + "\n\tstd::array<float, 3> add_key(Vec& pos) const "
            "{ return {0.f, 0.f, 0.f}; }\n"
            "\tstd::array<float, 3> add_value(std::array<float, 3>& "
            "x_reduced) const { return {0.f, 0.f, 0.f}; }",
        )

    txt = txt.replace("srand(time(NULL));", f"srand({seed});")
    txt = txt.replace(
        "int w = 512, h = 512;", f"int w = {width}, h = {height};"
    )
    txt = txt.replace("int samps = 16;", f"int samps = {spp};")
    # Skip the 1.3s RL state-space init (unused once the hijack is gone).
    txt = txt.replace(
        "int number_states = create_state_space(dict);",
        "int number_states = 0;",
    )
    # Decorrelate the per-row rand48 streams across seeds.
    txt = txt.replace(
        "Xi[3] = { 0, 0, y * y * y }",
        f"Xi[3] = {{ 0, 0, (unsigned short)(y * y * y + {seed}) }}",
    )
    # Estimator selection via the mixture coin threshold (q < 1 at HEAD).
    q = {"nee": "1", "mixture": "0.5", "cosine": "-1", "uniform": "-1"}[estimator]
    txt = txt.replace("if (q < 1) {", f"if (q < {q}) {{")
    if estimator == "uniform":
        assert _COSINE_RETURN in txt
        txt = txt.replace(_COSINE_RETURN, _UNIFORM_RETURN)
    if light_mode == "intended":
        txt = txt.replace(
            "double x_light = 32 + rand() * 36 / double(RAND_MAX);",
            "double x_light = 32 + (rand() / double(RAND_MAX)) * 36;",
        )
        txt = txt.replace(
            "double z_light = 63 + rand() * 36 / double(RAND_MAX);",
            "double z_light = 63 + (rand() / double(RAND_MAX)) * 36;",
        )
    else:
        assert light_mode == "glibc_overflow"
    if self_hit_eps:
        # The as-built reference accepts fp self-intersections (rect hit
        # requires only t < 0 rejection, smallpt.cpp:106/149/192; after a
        # bounce the f64 residual leaves the origin ~1e-14 behind the plane
        # about half the time, adding a spurious extra albedo factor).
        # Measured effect: cosine-mode image ~3.5% darker than a
        # self-hit-free render. This patch adds the epsilon so the oracle
        # tests the *estimator*, not the fp artifact.
        n = txt.count("|| t < 0)")
        assert n == 3, n
        txt = txt.replace("|| t < 0)", f"|| t < {self_hit_eps})")
    # Also accumulate the UNCLAMPED per-pixel mean (the quantity our
    # differentiable render_linear computes; the C3 clamp zeroes FD
    # gradients of saturated pixels) into a parallel buffer.
    txt = txt.replace(
        "c[i] = c[i] + Vec(clamp(r.x), clamp(r.y), clamp(r.z));",
        "c[i] = c[i] + Vec(clamp(r.x), clamp(r.y), clamp(r.z));\n"
        "\t\t\tcl[i] = cl[i] + r;",
    )
    txt = txt.replace(
        "Vec r;",
        "Vec r;\n\tVec *cl = new Vec[w * h];",
        1,
    )
    # Dump both accumulators next to the PPM.
    txt = txt.replace(
        'FILE *f = fopen("show_allrect_differentplane_red_state.ppm", "w");',
        '{ FILE *rf = fopen("oracle_raw.bin", "wb");'
        " fwrite(c, sizeof(Vec), w * h, rf); fclose(rf); }\n"
        '\t{ FILE *rf = fopen("oracle_linear.bin", "wb");'
        " fwrite(cl, sizeof(Vec), w * h, rf); fclose(rf); }\n"
        '\tFILE *f = fopen("oracle.ppm", "w");',
    )
    return txt


def render_oracle(
    width: int = 128,
    height: int = 128,
    spp: int = 64,
    seed: int = 1,
    estimator: str = "nee",
    light_mode: str = "intended",
    self_hit_eps: float = 0.0,
    timeout: float = 1800.0,
    scene: str = "box",
    overrides: dict | None = None,
    linear: bool = False,
    spec_refr: str = "",
) -> np.ndarray | None:
    """Build + run the oracle; returns the linear (h, w, 3) float64 image
    (per-pixel mean radiance, clamped per contract C3), cached on disk.

    self_hit_eps > 0 patches the reference's rect intersectors to reject
    near-zero hits (see _patched_source) — use for estimator-parity tests;
    0.0 is the as-built behavior. scene/overrides select the sphere-pair
    variant and patch differentiable parameters (see _scene_table) — the
    FD-gradient-parity oracle. linear=True returns the UNCLAMPED per-pixel
    mean (what render_linear computes; required for FD gradients, where the
    C3 clamp would zero saturated pixels)."""
    if not available():
        return None
    key_s = (
        f"v4|{width}x{height}x{spp}|{seed}|{estimator}|{light_mode}"
        f"|{self_hit_eps}"
    )
    if scene != "box" or overrides or spec_refr:
        # Appended only when used, so round-1 cache entries stay valid.
        key_s += f"|{scene}|{sorted((overrides or {}).items())}|{spec_refr}"
    key = hashlib.md5(key_s.encode()).hexdigest()[:16]
    CACHE.mkdir(exist_ok=True)
    npy = CACHE / f"oracle_{key}.npy"
    npy_lin = CACHE / f"oracle_{key}_lin.npy"
    if npy.exists() and (not linear or npy_lin.exists()):
        return np.load(npy_lin if linear else npy)

    work = Path("/tmp/spt_oracle") / key
    work.mkdir(parents=True, exist_ok=True)
    (work / "smallpt_oracle.cpp").write_text(
        _patched_source(
            width, height, spp, seed, estimator, light_mode, self_hit_eps,
            scene, overrides, spec_refr,
        )
    )
    shutil.copy(REF_HDR, work / "utilities.h")
    subprocess.run(
        ["g++", "-O3", "-w", "-o", "oracle", "smallpt_oracle.cpp"],
        cwd=work,
        check=True,
        capture_output=True,
    )
    subprocess.run(
        ["./oracle"], cwd=work, check=True, capture_output=True, timeout=timeout
    )
    raw = np.fromfile(work / "oracle_raw.bin", dtype=np.float64)
    img = raw.reshape(height, width, 3)
    np.save(npy, img)
    lin = np.fromfile(work / "oracle_linear.bin", dtype=np.float64)
    lin = lin.reshape(height, width, 3)
    np.save(npy_lin, lin)
    return lin if linear else img
