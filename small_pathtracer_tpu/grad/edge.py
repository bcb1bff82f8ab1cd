"""Edge-sampled boundary gradients for sphere geometry.

Pathwise AD through the wavefront (grad/adjoint.py) differentiates the
smooth integrand along FIXED paths and therefore misses the boundary term
of geometry parameters: translating or scaling a sphere moves its
silhouette across pixels, and that visibility discontinuity carries most
of the in-image-plane gradient (the same failure mode pinned for camera
translation in tests/test_grad.py; grad/score.py's docstring flags this as
the remaining "edge/boundary sampling" gap). The soft renderer
(grad/soft.py) works around it by blurring the image; this module
estimates the TRUE boundary term of the hard render instead.

Method (Reynolds transport / differentiable-rendering edge sampling a la
Li et al. 2018, specialized to spheres under the pinhole camera):

    I_p(theta) = (1/A) ∫_pixel L ds dt,   A = pixel area = 1/(w*h)
    dI_p/dtheta = interior (pathwise AD)
        + w*h * ∫_{silhouette ∩ pixel} (L_in - L_out) (V . n̂) dl

where V = dS/dtheta is the screen-space velocity of the silhouette point
and n̂ the outward (away-from-sphere) screen normal. A sphere's silhouette
is the analytic limb circle

    c_l = c - (r^2/D) d̂,  rho = r sqrt(1 - (r/D)^2),  d̂ = (c - o)/D,

so the curve is sampled EXACTLY (uniform in the limb angle phi) and every
screen quantity — position S(phi; theta), arc measure |dS/dphi|, velocity
dS/dtheta — comes out of jax.jacfwd through the projection chain; no
hand-derived Jacobians. L_in/L_out are path-traced estimates through film
points straddling the edge at +-delta_px with COMMON path ids, so where
another object occludes the limb both rays see the same first hit and the
contribution cancels exactly — occlusion needs no explicit test.

Everything is fixed-shape and batched over the phi samples: one
path_trace_fixed call of 2*n_phi*n_sub lanes — TPU-shaped like any other
wavefront launch.

SCOPE: the PRIMARY-visibility silhouette term only. A moving sphere also
sweeps discontinuities the camera never sees directly — its cast-shadow
boundary (NEE visibility) and its silhouette as seen from secondary
vertices. Those boundary terms are NOT estimated here; grad/soft.py's
softened visibility remains the (approximate) tool for shadow-driven
objectives. On scenes where the sphere shades the rest of the image
strongly, (pathwise + this module) is therefore still short of the full
FD gradient — by exactly the shadow/indirect boundary flow.

Validated (tests/test_edge.py): (1) the screen machinery against a
brute-force FD of the analytic coverage integral (1-3%); (2) the full
estimator against render FD on an emissive-sphere/black-box scene where
the image gradient IS the primary boundary term (pathwise ~ 0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..camera.pinhole import CameraParams
from ..config import RenderConfig
from ..core import vecmath as vm
from ..integrator.wavefront import path_trace_fixed
from ..scene.types import Scene


def project_film(cam: CameraParams, X: jnp.ndarray) -> jnp.ndarray:
    """World points (..., 3) -> film coords (s, t) (..., 2).

    Inverts the C5 ray relation X - o = lam * (ll - o + s*H + t*V): with
    M = [ll-o | H | V], M^-1 (X - o) = (lam, lam*s, lam*t); closed-form
    rows via cross products (same algebra as grad/warp._flow_jacobian)."""
    A = jnp.asarray(cam.lower_left, jnp.float32) - jnp.asarray(
        cam.origin, jnp.float32
    )
    H = jnp.asarray(cam.horizontal, jnp.float32)
    V = jnp.asarray(cam.vertical, jnp.float32)
    det = jnp.dot(A, jnp.cross(H, V))
    r0 = jnp.cross(H, V) / det
    r1 = jnp.cross(V, A) / det
    r2 = jnp.cross(A, H) / det
    Xo = X - jnp.asarray(cam.origin, jnp.float32)
    y0 = Xo @ r0
    y1 = Xo @ r1
    y2 = Xo @ r2
    y0 = jnp.where(jnp.abs(y0) > 1e-9, y0, 1e-9)
    return jnp.stack([y1 / y0, y2 / y0], axis=-1)


def _limb_point(o_cam, center, radius, phi):
    """Silhouette (limb) point of the sphere seen from o_cam at angle phi
    around the view axis. Differentiable in (center, radius)."""
    dvec = center - o_cam
    D2 = jnp.dot(dvec, dvec)
    D = jnp.sqrt(D2)
    dn = dvec / D
    # Guard D > r (camera outside the sphere); callers check visibility.
    rr = jnp.minimum(radius / D, 0.999)
    cl = center - (radius * rr) * dn
    rho = radius * jnp.sqrt(1.0 - rr * rr)
    e1, e2 = vm.onb_from_w(dn[None])
    e1, e2 = e1[0], e2[0]
    return cl + rho * (jnp.cos(phi) * e1 + jnp.sin(phi) * e2)


def _film_point(theta, phi, cam):
    """S(phi; theta) on film, theta = [cx, cy, cz, r]."""
    p = _limb_point(
        jnp.asarray(cam.origin, jnp.float32), theta[:3], theta[3], phi
    )
    return project_film(cam, p)


def silhouette_screen(cam: CameraParams, center, radius, n_phi: int):
    """Screen geometry of a sphere's silhouette at n_phi limb angles:
    (S (K,2) film position, J (K,2,4) dS/d[cx,cy,cz,r], n_hat (K,2)
    outward film normal, dl (K,) arc measure |dS/dphi|). All derivatives
    via jax.jacfwd through the limb+projection chain — no hand-derived
    Jacobians. Validated against a brute-force FD of the screen coverage
    integral in tests/test_edge.py."""
    theta = jnp.concatenate([center, radius[None]])
    phis = (jnp.arange(n_phi, dtype=jnp.float32) + 0.5) * (
        2.0 * jnp.pi / n_phi
    )
    S = jax.vmap(lambda p: _film_point(theta, p, cam))(phis)      # (K, 2)
    J = jax.vmap(lambda p: jax.jacfwd(_film_point)(theta, p, cam))(
        phis
    )                                                             # (K, 2, 4)
    tau = jax.vmap(
        lambda p: jax.jacfwd(_film_point, argnums=1)(theta, p, cam)
    )(phis)                                                       # (K, 2)
    dl = jnp.linalg.norm(tau, axis=-1)                            # (K,)
    t_hat = tau / jnp.maximum(dl, 1e-12)[:, None]
    n_hat = jnp.stack([t_hat[:, 1], -t_hat[:, 0]], axis=-1)
    Sc = project_film(cam, center)
    flip = jnp.sum(n_hat * (S - Sc), axis=-1) < 0.0
    n_hat = jnp.where(flip[:, None], -n_hat, n_hat)
    return S, J, n_hat, dl


@partial(jax.jit, static_argnums=(2, 4, 5, 6, 7))
def _edge_grad_impl(scene: Scene, cam: CameraParams, cfg: RenderConfig,
                    g_img, sphere_idx: int, n_phi: int, n_sub: int,
                    n_bounces: int, seed, delta_px):
    w, h = cfg.width, cfg.height
    center = scene.spheres.center[sphere_idx]
    radius = scene.spheres.radius[sphere_idx]
    S, J, n_hat, dl = silhouette_screen(cam, center, radius, n_phi)

    # Pixel bin + loss cotangent at each edge sample (film -> C4 indices).
    px = jnp.floor(S[:, 0] * w + 0.5).astype(jnp.int32)
    row = jnp.floor(S[:, 1] * h + 0.5).astype(jnp.int32)
    py = h - 1 - row
    inside = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    pxc = jnp.clip(px, 0, w - 1)
    pyc = jnp.clip(py, 0, h - 1)
    g = jnp.asarray(g_img, jnp.float32)[pyc, pxc]                 # (K, 3)
    g = g * inside[:, None].astype(jnp.float32)

    # L_in / L_out through straddling film points: offset delta_px PIXELS
    # along the pixel-metric edge normal (anisotropy-correct), mapped back
    # to film units. Common path ids across the pair (and across
    # sub-samples of a pair) => occluded arcs cancel exactly.
    n_pix = jnp.stack([n_hat[:, 0] * w, n_hat[:, 1] * h], axis=-1)
    n_pix = n_pix / jnp.maximum(
        jnp.linalg.norm(n_pix, axis=-1, keepdims=True), 1e-12
    )
    off = jnp.stack(
        [n_pix[:, 0] * (delta_px / w), n_pix[:, 1] * (delta_px / h)],
        axis=-1,
    )

    def rays_at(Spts):
        D = (
            jnp.asarray(cam.lower_left, jnp.float32)[None]
            + Spts[:, 0:1] * jnp.asarray(cam.horizontal, jnp.float32)[None]
            + Spts[:, 1:2] * jnp.asarray(cam.vertical, jnp.float32)[None]
            - jnp.asarray(cam.origin, jnp.float32)[None]
        )
        d = vm.norm(D)
        o = jnp.broadcast_to(
            jnp.asarray(cam.origin, jnp.float32)[None], d.shape
        )
        return o, d

    S_in = jnp.repeat(S - off, n_sub, axis=0)                 # (K*n_sub, 2)
    S_out = jnp.repeat(S + off, n_sub, axis=0)
    o_in, d_in = rays_at(S_in)
    o_out, d_out = rays_at(S_out)
    pid = jnp.arange(n_phi * n_sub, dtype=jnp.uint32)
    L_in, _ = path_trace_fixed(
        scene, cfg, jnp.uint32(seed), o_in, d_in, pid, n_bounces
    )
    L_out, _ = path_trace_fixed(
        scene, cfg, jnp.uint32(seed), o_out, d_out, pid, n_bounces
    )
    f_in = L_in.reshape(n_phi, n_sub, 3).mean(axis=1)
    f_out = L_out.reshape(n_phi, n_sub, 3).mean(axis=1)

    # d loss / d theta_j = sum_k  <g, f_in - f_out> (V_j . n̂) dl (2π/K) wh
    gdot = jnp.sum(g * (f_in - f_out), axis=-1)                   # (K,)
    v_n = jnp.einsum("kij,ki->kj", J, n_hat)                      # (K, 4)
    contrib = (gdot * dl)[:, None] * v_n
    d_theta = contrib.sum(axis=0) * (2.0 * jnp.pi / n_phi) * (w * h)
    return d_theta[:3], d_theta[3]


def edge_grad(scene: Scene, cam: CameraParams, cfg: RenderConfig,
              g_img, sphere_idx: int, seed=0, n_phi: int = 1024,
              n_sub: int = 4, n_bounces: int = 8,
              delta_px: float = 0.25):
    """Boundary term of d(loss)/d(sphere center, radius).

    g_img: loss cotangent d loss / d image, (h, w, 3) — same convention as
    grad/warp.camera_origin_warp_grad. Returns (d_center (3,), d_radius
    scalar). Add to the pathwise gradient (jax.grad of
    adjoint.render_linear) for the full geometry gradient; use a seed
    distinct from the render's to decorrelate the edge estimator."""
    return _edge_grad_impl(
        scene, cam, cfg, g_img, int(sphere_idx), int(n_phi), int(n_sub),
        int(n_bounces), seed, jnp.float32(delta_px),
    )
