"""Scene presets.

- ``cornell_box``: the 17-rect scene at the reference HEAD
  (/root/reference/src/smallpt.cpp:287-311; SURVEY.md section 2.3). Light is
  object id 6.
- ``cornell_spheres``: the sphere variant of most committed reference renders
  — same walls + light, with the two commented-out spheres
  (smallpt.cpp:297-298) instead of the two boxes.
- ``smallpt_original``: stretch parity with Kevin Beason's original smallpt
  scene (SPEC mirror + REFR glass; the reference keeps those material branches
  commented at smallpt.cpp:481-495, contract C16), with rect walls and the
  Cornell rect light — the fast, rect-native variant.
- ``smallpt_original_true``: the SAME scene as Beason wrote it — nine
  spheres, including the radius-1e5 giant-sphere walls (exact in f32 via the
  recentered quadratic + radius-scaled eps, geometry/intersect.py) and the
  radius-600 sky light at (50, 681.33, 81.6) with e=(12,12,12), cone-sampled
  (scene/types.SphereLight). Sphere lineage: the commented pair at
  /root/reference/src/smallpt.cpp:297-298 and the README's smallpt heritage.
- ``cornell_spheres_roundlight``: the look of the committed historic renders
  (round ceiling light over the sphere pair — /root/reference/
  image_32pps_totalrandom.ppm et al., SURVEY.md section 4.2): Cornell walls,
  the two DIFF spheres, and a spherical emitter poking through the ceiling.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .types import (
    DIFF, GLOS, LIGHT_RECT, LIGHT_SPHERE, REFR, SPEC, LightList,
    LightSampler, Scene, SphereLight, make_scene,
)

# Axis codes
AX_X, AX_Y, AX_Z = 0, 1, 2

_WHITE75 = (0.75, 0.75, 0.75)
_ZERO = (0.0, 0.0, 0.0)
_ONE = (1.0, 1.0, 1.0)


def _cornell_walls() -> list[tuple]:
    """The 7 wall/light rects (smallpt.cpp:288-294)."""
    return [
        # (axis, k, (lo0, lo1), (hi0, hi1), albedo, emission, refl)
        (AX_Z, 0.0, (1.0, 0.0), (99.0, 81.6), _WHITE75, _ZERO, DIFF),   # Front
        (AX_Z, 170.0, (1.0, 0.0), (99.0, 81.6), _WHITE75, _ZERO, DIFF),  # Back
        (AX_X, 1.0, (0.0, 0.0), (81.6, 170.0), (0.25, 0.75, 0.25), _ZERO, DIFF),  # Left
        (AX_X, 99.0, (0.0, 0.0), (81.6, 170.0), (0.75, 0.25, 0.25), _ZERO, DIFF),  # Right
        (AX_Y, 0.0, (1.0, 0.0), (99.0, 170.0), _WHITE75, _ZERO, DIFF),  # Bottom
        (AX_Y, 81.6, (1.0, 0.0), (99.0, 170.0), _WHITE75, _ZERO, DIFF),  # Top
        (AX_Y, 81.5, (32.0, 63.0), (68.0, 96.0), _ZERO, (12.0, 12.0, 12.0), DIFF),  # Light (id 6)
    ]


def _cornell_light_sampler() -> LightSampler:
    """Contract C13 exactly: sample x in [32, 32+36], z in [63, 63+36] on the
    y=81.6 plane; area 36*36=1296; light object id 6 (smallpt.cpp:363-369,467,471)."""
    return LightSampler(
        corner=jnp.asarray([32.0, 81.6, 63.0], jnp.float32),
        edge_u=jnp.asarray([36.0, 0.0, 0.0], jnp.float32),
        edge_v=jnp.asarray([0.0, 0.0, 36.0], jnp.float32),
        light_obj_id=jnp.asarray(6, jnp.int32),
    )


def cornell_box() -> Scene:
    """Reference HEAD scene: 6 walls + light + two 5-face boxes
    (smallpt.cpp:287-311)."""
    rects = _cornell_walls() + [
        # Tall box, x in [12,42], y in [0,50], z in [32,62] (:300-304)
        (AX_Z, 32.0, (12.0, 0.0), (42.0, 50.0), _ONE, _ZERO, DIFF),
        (AX_Z, 62.0, (12.0, 0.0), (42.0, 50.0), _ONE, _ZERO, DIFF),
        (AX_X, 12.0, (0.0, 32.0), (50.0, 62.0), _ONE, _ZERO, DIFF),
        (AX_X, 42.0, (0.0, 32.0), (50.0, 62.0), _ONE, _ZERO, DIFF),
        (AX_Y, 50.0, (12.0, 32.0), (42.0, 62.0), _ONE, _ZERO, DIFF),
        # Short box, x in [63,88], y in [0,25], z in [63,88] (:306-310)
        (AX_Z, 63.0, (63.0, 0.0), (88.0, 25.0), _ONE, _ZERO, DIFF),
        (AX_Z, 88.0, (63.0, 0.0), (88.0, 25.0), _ONE, _ZERO, DIFF),
        (AX_X, 63.0, (0.0, 63.0), (25.0, 88.0), _ONE, _ZERO, DIFF),
        (AX_X, 88.0, (0.0, 63.0), (25.0, 88.0), _ONE, _ZERO, DIFF),
        (AX_Y, 25.0, (63.0, 63.0), (88.0, 88.0), _ONE, _ZERO, DIFF),
    ]
    return make_scene(rects, [], _cornell_light_sampler())


def cornell_spheres() -> Scene:
    """Sphere-pair variant (the scene of most committed PPMs / BASELINE.json
    "Cornell sphere scene"): walls + light + the two commented spheres
    (smallpt.cpp:297-298), both DIFF."""
    spheres = [
        ((27.0, 16.5, 47.0), 16.5, (0.999, 0.999, 0.999), _ZERO, DIFF),
        ((73.0, 16.5, 78.0), 16.5, _WHITE75, _ZERO, DIFF),
    ]
    return make_scene(_cornell_walls(), spheres, _cornell_light_sampler())


def smallpt_original() -> Scene:
    """Classic smallpt scene with SPEC/REFR spheres (stretch parity, C16) —
    the RECT-NATIVE variant: box [1,99]x[0,81.6]x[0,170] as rect walls with
    original smallpt wall colors; mirror + glass spheres; the rad-600 sky
    sphere light swapped for this repo's Cornell rect light. For Beason's
    scene datum-for-datum (giant-sphere walls + cone-sampled sphere light)
    use ``smallpt_original_true``."""
    rects = [
        (AX_Z, 0.0, (1.0, 0.0), (99.0, 81.6), _WHITE75, _ZERO, DIFF),  # back (grey)
        (AX_Z, 170.0, (1.0, 0.0), (99.0, 81.6), _ZERO, _ZERO, DIFF),  # front (black)
        (AX_X, 1.0, (0.0, 0.0), (81.6, 170.0), (0.75, 0.25, 0.25), _ZERO, DIFF),  # left red
        (AX_X, 99.0, (0.0, 0.0), (81.6, 170.0), (0.25, 0.25, 0.75), _ZERO, DIFF),  # right blue
        (AX_Y, 0.0, (1.0, 0.0), (99.0, 170.0), _WHITE75, _ZERO, DIFF),  # floor
        (AX_Y, 81.6, (1.0, 0.0), (99.0, 170.0), _WHITE75, _ZERO, DIFF),  # ceiling
        (AX_Y, 81.5, (32.0, 63.0), (68.0, 96.0), _ZERO, (12.0, 12.0, 12.0), DIFF),  # light
    ]
    spheres = [
        ((27.0, 16.5, 47.0), 16.5, (0.999, 0.999, 0.999), _ZERO, SPEC),  # mirror
        ((73.0, 16.5, 78.0), 16.5, (0.999, 0.999, 0.999), _ZERO, REFR),  # glass
    ]
    return make_scene(rects, spheres, _cornell_light_sampler())


def smallpt_original_true() -> Scene:
    """Kevin Beason's original smallpt scene, datum-for-datum: nine spheres
    (six radius-1e5 walls, mirror, glass, and the radius-600 sky light with
    e=(12,12,12) at (50, 681.6-.27, 81.6)).

    The giant walls exercise the recentered f32 sphere quadratic
    (geometry/intersect.intersect_spheres) and the sky light the SphereLight
    cone sampler — the two capabilities the rect-substituted
    ``smallpt_original`` preset deliberately avoided before round 5.
    Object ids: spheres 0-8 in Beason's order; light = id 8."""
    spheres = [
        ((1e5 + 1.0, 40.8, 81.6), 1e5, (0.75, 0.25, 0.25), _ZERO, DIFF),   # left
        ((-1e5 + 99.0, 40.8, 81.6), 1e5, (0.25, 0.25, 0.75), _ZERO, DIFF),  # right
        ((50.0, 40.8, 1e5), 1e5, _WHITE75, _ZERO, DIFF),                    # back
        ((50.0, 40.8, -1e5 + 170.0), 1e5, _ZERO, _ZERO, DIFF),              # front
        ((50.0, 1e5, 81.6), 1e5, _WHITE75, _ZERO, DIFF),                    # floor
        ((50.0, -1e5 + 81.6, 81.6), 1e5, _WHITE75, _ZERO, DIFF),            # ceiling
        ((27.0, 16.5, 47.0), 16.5, (0.999, 0.999, 0.999), _ZERO, SPEC),     # mirror
        ((73.0, 16.5, 78.0), 16.5, (0.999, 0.999, 0.999), _ZERO, REFR),     # glass
        ((50.0, 681.6 - 0.27, 81.6), 600.0, _ZERO, (12.0, 12.0, 12.0), DIFF),  # light
    ]
    light = SphereLight(
        center=jnp.asarray([50.0, 681.6 - 0.27, 81.6], jnp.float32),
        radius=jnp.asarray(600.0, jnp.float32),
        light_obj_id=jnp.asarray(8, jnp.int32),
    )
    return make_scene([], spheres, light)


def cornell_spheres_roundlight() -> Scene:
    """The historic-render look (round ceiling light, sphere pair): Cornell
    walls — ceiling darkened to the committed renders' look — plus the two
    commented spheres and a radius-12 spherical emitter at (50, 90, 81.6)
    whose lower cap hangs ~3.6 units below the y=81.6 ceiling (visible
    disc radius ~8.6, matching the round light in
    /root/reference/image_32pps_totalrandom.ppm). Object ids: walls 0-5,
    spheres 6-7, light sphere = 8. Cone-sampled NEE; cone samples occluded
    by the ceiling ring simply fail the probe (unbiased fallback)."""
    walls = [
        (AX_Z, 0.0, (1.0, 0.0), (99.0, 81.6), _WHITE75, _ZERO, DIFF),
        (AX_Z, 170.0, (1.0, 0.0), (99.0, 81.6), _WHITE75, _ZERO, DIFF),
        (AX_X, 1.0, (0.0, 0.0), (81.6, 170.0), (0.25, 0.75, 0.25), _ZERO, DIFF),
        (AX_X, 99.0, (0.0, 0.0), (81.6, 170.0), (0.75, 0.25, 0.25), _ZERO, DIFF),
        (AX_Y, 0.0, (1.0, 0.0), (99.0, 170.0), _WHITE75, _ZERO, DIFF),
        (AX_Y, 81.6, (1.0, 0.0), (99.0, 170.0), (0.35, 0.35, 0.35), _ZERO, DIFF),
    ]
    spheres = [
        ((27.0, 16.5, 47.0), 16.5, (0.999, 0.999, 0.999), _ZERO, DIFF),
        ((73.0, 16.5, 78.0), 16.5, _WHITE75, _ZERO, DIFF),
        ((50.0, 90.0, 81.6), 12.0, _ZERO, (22.0, 22.0, 22.0), DIFF),
    ]
    light = SphereLight(
        center=jnp.asarray([50.0, 90.0, 81.6], jnp.float32),
        radius=jnp.asarray(12.0, jnp.float32),
        light_obj_id=jnp.asarray(8, jnp.int32),
    )
    return make_scene(walls, spheres, light)


def cornell_tilted_light() -> Scene:
    """Cornell box with a TILTED parallelogram light (BASELINE.json config
    #3: "explicit light sampling (NEE) with rect/tilted-plane lights").

    The rect light (id 6) is replaced by a quad hung below the ceiling,
    pitched ~15 degrees about x: corner (32, 78, 63), edge_u (36, 0, 0),
    edge_v (0, 9.3, 34.8). The NEE sampler shares the quad's exact
    geometry, so the area/normal weights (C13 generalized) stay consistent.
    Object ids: 16 rects (0-15), quad light = 16."""
    walls = [r for i, r in enumerate(_cornell_walls()) if i != 6]
    # The two boxes (same as cornell_box, smallpt.cpp:300-310).
    box_rects = [
        (AX_Z, 32.0, (12.0, 0.0), (42.0, 50.0), _ONE, _ZERO, DIFF),
        (AX_Z, 62.0, (12.0, 0.0), (42.0, 50.0), _ONE, _ZERO, DIFF),
        (AX_X, 12.0, (0.0, 32.0), (50.0, 62.0), _ONE, _ZERO, DIFF),
        (AX_X, 42.0, (0.0, 32.0), (50.0, 62.0), _ONE, _ZERO, DIFF),
        (AX_Y, 50.0, (12.0, 32.0), (42.0, 62.0), _ONE, _ZERO, DIFF),
        (AX_Z, 63.0, (63.0, 0.0), (88.0, 25.0), _ONE, _ZERO, DIFF),
        (AX_Z, 88.0, (63.0, 0.0), (88.0, 25.0), _ONE, _ZERO, DIFF),
        (AX_X, 63.0, (0.0, 63.0), (25.0, 88.0), _ONE, _ZERO, DIFF),
        (AX_X, 88.0, (0.0, 63.0), (25.0, 88.0), _ONE, _ZERO, DIFF),
        (AX_Y, 25.0, (63.0, 63.0), (88.0, 88.0), _ONE, _ZERO, DIFF),
    ]
    corner = (32.0, 78.0, 63.0)
    edge_u = (36.0, 0.0, 0.0)
    tilt = math.radians(15.0)
    edge_v = (0.0, 36.0 * math.sin(tilt), 36.0 * math.cos(tilt))
    quads = [(corner, edge_u, edge_v, _ZERO, (12.0, 12.0, 12.0), DIFF)]
    light = LightSampler(
        corner=jnp.asarray(corner, jnp.float32),
        edge_u=jnp.asarray(edge_u, jnp.float32),
        edge_v=jnp.asarray(edge_v, jnp.float32),
        light_obj_id=jnp.asarray(16, jnp.int32),  # after the 16 rects
    )
    return make_scene(walls + box_rects, [], light, quads=quads)


def cornell_alcove() -> Scene:
    """HARD-TRANSPORT preset: the only light sits recessed in a baffled
    ceiling alcove, visible from the room solely through a 10x33 slot in
    the ceiling (x in [45,55], z in [63,96]).

    Purpose (round-3 VERDICT item 6): a scene where path guiding has
    real work to do. BSDF-sampled transport (cosine / nee_textbook
    continuations) almost never finds the slot from the floor — the slot
    subtends ~1e-2 sr from most of the room — and NEE shadow probes to
    the light are occluded except from points nearly under the opening,
    so unguided variance is dominated by rare lucky paths. A guide lobe
    aimed at the slot converts those into common paths.

    Object ids: 0-4 front/back/left/right/floor, 5-8 ceiling pieces
    around the slot, 9-12 alcove cavity walls, 13 = LIGHT (y=94, the
    alcove top), 14-23 the two standard boxes."""
    walls = _cornell_walls()[:5]
    ceiling = [
        (AX_Y, 81.6, (1.0, 0.0), (45.0, 170.0), _WHITE75, _ZERO, DIFF),
        (AX_Y, 81.6, (55.0, 0.0), (99.0, 170.0), _WHITE75, _ZERO, DIFF),
        (AX_Y, 81.6, (45.0, 0.0), (55.0, 63.0), _WHITE75, _ZERO, DIFF),
        (AX_Y, 81.6, (45.0, 96.0), (55.0, 170.0), _WHITE75, _ZERO, DIFF),
    ]
    cavity = [
        (AX_X, 45.0, (81.6, 63.0), (94.0, 96.0), _WHITE75, _ZERO, DIFF),
        (AX_X, 55.0, (81.6, 63.0), (94.0, 96.0), _WHITE75, _ZERO, DIFF),
        (AX_Z, 63.0, (45.0, 81.6), (55.0, 94.0), _WHITE75, _ZERO, DIFF),
        (AX_Z, 96.0, (45.0, 81.6), (55.0, 94.0), _WHITE75, _ZERO, DIFF),
    ]
    light_rect = [
        (AX_Y, 94.0, (45.0, 63.0), (55.0, 96.0), _ZERO,
         (40.0, 40.0, 40.0), DIFF),
    ]
    box_rects = [
        (AX_Z, 32.0, (12.0, 0.0), (42.0, 50.0), _ONE, _ZERO, DIFF),
        (AX_Z, 62.0, (12.0, 0.0), (42.0, 50.0), _ONE, _ZERO, DIFF),
        (AX_X, 12.0, (0.0, 32.0), (50.0, 62.0), _ONE, _ZERO, DIFF),
        (AX_X, 42.0, (0.0, 32.0), (50.0, 62.0), _ONE, _ZERO, DIFF),
        (AX_Y, 50.0, (12.0, 32.0), (42.0, 62.0), _ONE, _ZERO, DIFF),
        (AX_Z, 63.0, (63.0, 0.0), (88.0, 25.0), _ONE, _ZERO, DIFF),
        (AX_Z, 88.0, (63.0, 0.0), (88.0, 25.0), _ONE, _ZERO, DIFF),
        (AX_X, 63.0, (0.0, 63.0), (25.0, 88.0), _ONE, _ZERO, DIFF),
        (AX_X, 88.0, (0.0, 63.0), (25.0, 88.0), _ONE, _ZERO, DIFF),
        (AX_Y, 25.0, (63.0, 63.0), (88.0, 88.0), _ONE, _ZERO, DIFF),
    ]
    light = LightSampler(
        corner=jnp.asarray((45.0, 94.0, 63.0), jnp.float32),
        edge_u=jnp.asarray((10.0, 0.0, 0.0), jnp.float32),
        edge_v=jnp.asarray((0.0, 0.0, 33.0), jnp.float32),
        light_obj_id=jnp.asarray(13, jnp.int32),
    )
    return make_scene(
        walls + ceiling + cavity + light_rect + box_rects, [], light
    )


def cornell_alcove_baffled() -> Scene:
    """cornell_alcove with the emitter moved onto the alcove's SIDE wall
    (x = 45, facing +x): no floor/left-room position has a direct
    sightline to it through the slot, and NEE shadow probes succeed only
    from a small right-of-slot region — the image is dominated by
    2-bounce transport (room -> slot -> brightly lit x = 55 cavity wall
    -> emitter), whose variance is "which directions find the glowing
    slot".

    Purpose: the regime NEE/MIS cannot fix (the glowing wall is not an
    emitter) but path guiding can; the multi-vertex training-credit ring
    in train_guide exists for exactly this preset (last-vertex-only
    credit never teaches the floor voxels).

    Object ids: 0-4 walls/floor, 5-8 ceiling around the slot, 9-13
    cavity walls + top, 14 = LIGHT (x = 45.5 inside the cavity, facing
    +x, y in [81.6,94] x z in [63,96]), 15-24 boxes."""
    _D = (0.35, 0.35, 0.35)   # dark room: kills the smooth
    _B = (0.45, 0.45, 0.45)   # inter-reflection component, so the
    # slot-direct term dominates pixel variance (the transport guiding
    # targets; with 0.75/0.999 albedos the diffuse bath swamps it and
    # guiding measures as a wash).
    walls = [
        (AX_Z, 0.0, (1.0, 0.0), (99.0, 81.6), _D, _ZERO, DIFF),
        (AX_Z, 170.0, (1.0, 0.0), (99.0, 81.6), _D, _ZERO, DIFF),
        (AX_X, 1.0, (0.0, 0.0), (81.6, 170.0), (0.15, 0.45, 0.15), _ZERO, DIFF),
        (AX_X, 99.0, (0.0, 0.0), (81.6, 170.0), (0.45, 0.15, 0.15), _ZERO, DIFF),
        (AX_Y, 0.0, (1.0, 0.0), (99.0, 170.0), _D, _ZERO, DIFF),
    ]
    ceiling = [
        (AX_Y, 81.6, (1.0, 0.0), (45.0, 170.0), _D, _ZERO, DIFF),
        (AX_Y, 81.6, (55.0, 0.0), (99.0, 170.0), _D, _ZERO, DIFF),
        (AX_Y, 81.6, (45.0, 0.0), (55.0, 63.0), _D, _ZERO, DIFF),
        (AX_Y, 81.6, (45.0, 96.0), (55.0, 170.0), _D, _ZERO, DIFF),
    ]
    cavity = [
        (AX_X, 45.0, (81.6, 63.0), (94.0, 96.0), _WHITE75, _ZERO, DIFF),
        (AX_X, 55.0, (81.6, 63.0), (94.0, 96.0), _WHITE75, _ZERO, DIFF),
        (AX_Z, 63.0, (45.0, 81.6), (55.0, 94.0), _WHITE75, _ZERO, DIFF),
        (AX_Z, 96.0, (45.0, 81.6), (55.0, 94.0), _WHITE75, _ZERO, DIFF),
        (AX_Y, 94.0, (45.0, 63.0), (55.0, 96.0), _WHITE75, _ZERO, DIFF),
    ]
    light_rect = [
        # INSIDE the cavity (x = 45.5, just off the x = 45 wall), facing
        # +x. Rects are two-sided emitters with |cos| NEE weights, so a
        # light placed ON the open attic boundary would be reachable by
        # unobstructed probes from the whole ceiling's upper half-space
        # (observed: floodlit ceiling); the 0.5-unit inset puts the x=45
        # wall behind it and closes the leak.
        (AX_X, 45.5, (81.6, 63.0), (94.0, 96.0), _ZERO,
         (40.0, 40.0, 40.0), DIFF),
    ]
    box_rects = [
        (AX_Z, 32.0, (12.0, 0.0), (42.0, 50.0), _B, _ZERO, DIFF),
        (AX_Z, 62.0, (12.0, 0.0), (42.0, 50.0), _B, _ZERO, DIFF),
        (AX_X, 12.0, (0.0, 32.0), (50.0, 62.0), _B, _ZERO, DIFF),
        (AX_X, 42.0, (0.0, 32.0), (50.0, 62.0), _B, _ZERO, DIFF),
        (AX_Y, 50.0, (12.0, 32.0), (42.0, 62.0), _B, _ZERO, DIFF),
        (AX_Z, 63.0, (63.0, 0.0), (88.0, 25.0), _B, _ZERO, DIFF),
        (AX_Z, 88.0, (63.0, 0.0), (88.0, 25.0), _B, _ZERO, DIFF),
        (AX_X, 63.0, (0.0, 63.0), (25.0, 88.0), _B, _ZERO, DIFF),
        (AX_X, 88.0, (0.0, 63.0), (25.0, 88.0), _B, _ZERO, DIFF),
        (AX_Y, 25.0, (63.0, 63.0), (88.0, 88.0), _B, _ZERO, DIFF),
    ]
    light = LightSampler(
        corner=jnp.asarray((45.5, 81.6, 63.0), jnp.float32),
        edge_u=jnp.asarray((0.0, 12.4, 0.0), jnp.float32),
        edge_v=jnp.asarray((0.0, 0.0, 33.0), jnp.float32),
        light_obj_id=jnp.asarray(14, jnp.int32),
    )
    return make_scene(
        walls + ceiling + cavity + light_rect + box_rects, [], light
    )


def sphere_grid(n: int = 64, seed: int = 0) -> Scene:
    """Scalability stress preset: the Cornell walls + light + an n-sphere
    grid of varied albedos (some SPEC mirrors). The reference tops out at 17
    objects; this exercises O(N) intersection on the jnp path and compile-
    time unrolling in the megakernel at larger N."""
    import numpy as np

    rng_ = np.random.default_rng(seed)
    side = max(1, math.ceil(n ** (1 / 3)))
    spheres = []
    i = 0
    for gx in range(side):
        for gy in range(side):
            for gz in range(side):
                if i >= n:
                    break
                c = (
                    20.0 + 60.0 * gx / max(1, side - 1),
                    8.0 + 50.0 * gy / max(1, side - 1),
                    30.0 + 100.0 * gz / max(1, side - 1),
                )
                alb = tuple(float(a) for a in rng_.uniform(0.3, 0.95, 3))
                refl = SPEC if rng_.uniform() < 0.15 else DIFF
                spheres.append((c, 4.0, alb, _ZERO, refl))
                i += 1
    return make_scene(_cornell_walls(), spheres, _cornell_light_sampler())


def cornell_twolights() -> Scene:
    """Cornell box with TWO ceiling lights of different size and color —
    the multi-emitter NEE exercise (scene/types.LightList).

    The reference's NEE is hard-wired to one light (`id == 6`,
    smallpt.cpp:467); this preset is what that cannot render with explicit
    sampling. Walls 0-5, warm light id 6 (25x25, e=(17,12,4)), cool light
    id 7 (20x20, e=(4,10,18)), then the two standard boxes (ids 8-17).
    Light planes sit at y=81.5 and the samplers target the SAME plane —
    the 81.6-vs-81.5 mismatch is a single-light parity quirk (C13) not
    carried into new scenes. scene.light marks the warm light (for
    single-light-only consumers); NEE estimators use the list."""
    walls = _cornell_walls()[:6]
    light_rects = [
        (AX_Y, 81.5, (15.0, 63.0), (40.0, 88.0), _ZERO, (17.0, 12.0, 4.0), DIFF),
        (AX_Y, 81.5, (60.0, 68.0), (80.0, 88.0), _ZERO, (4.0, 10.0, 18.0), DIFF),
    ]
    box_rects = [
        (AX_Z, 32.0, (12.0, 0.0), (42.0, 50.0), _ONE, _ZERO, DIFF),
        (AX_Z, 62.0, (12.0, 0.0), (42.0, 50.0), _ONE, _ZERO, DIFF),
        (AX_X, 12.0, (0.0, 32.0), (50.0, 62.0), _ONE, _ZERO, DIFF),
        (AX_X, 42.0, (0.0, 32.0), (50.0, 62.0), _ONE, _ZERO, DIFF),
        (AX_Y, 50.0, (12.0, 32.0), (42.0, 62.0), _ONE, _ZERO, DIFF),
        (AX_Z, 63.0, (63.0, 0.0), (88.0, 25.0), _ONE, _ZERO, DIFF),
        (AX_Z, 88.0, (63.0, 0.0), (88.0, 25.0), _ONE, _ZERO, DIFF),
        (AX_X, 63.0, (0.0, 63.0), (25.0, 88.0), _ONE, _ZERO, DIFF),
        (AX_X, 88.0, (0.0, 63.0), (25.0, 88.0), _ONE, _ZERO, DIFF),
        (AX_Y, 25.0, (63.0, 63.0), (88.0, 88.0), _ONE, _ZERO, DIFF),
    ]
    light = LightSampler(
        corner=jnp.asarray([15.0, 81.5, 63.0], jnp.float32),
        edge_u=jnp.asarray([25.0, 0.0, 0.0], jnp.float32),
        edge_v=jnp.asarray([0.0, 0.0, 25.0], jnp.float32),
        light_obj_id=jnp.asarray(6, jnp.int32),
    )
    lights = LightList(
        corner=jnp.asarray(
            [[15.0, 81.5, 63.0], [60.0, 81.5, 68.0]], jnp.float32
        ),
        edge_u=jnp.asarray([[25.0, 0.0, 0.0], [20.0, 0.0, 0.0]], jnp.float32),
        edge_v=jnp.asarray([[0.0, 0.0, 25.0], [0.0, 0.0, 20.0]], jnp.float32),
        obj_id=jnp.asarray([6, 7], jnp.int32),
    )
    return make_scene(
        walls + light_rects + box_rects, [], light, lights=lights
    )


def cornell_glossy() -> Scene:
    """Cornell walls + light with a GLOSSY (modified-Phong, exponent 60)
    sphere next to a diffuse one — the minimal scene for the GLOS material
    extension (no reference analogue: Refl_t stops at REFR,
    smallpt.cpp:72-74). Renders under the BSDF-sampling estimators
    (cosine / nee_textbook / mis)."""
    spheres = [
        ((27.0, 16.5, 47.0), 16.5, (0.999, 0.999, 0.999), _ZERO, GLOS, 60.0),
        ((73.0, 16.5, 78.0), 16.5, _WHITE75, _ZERO, DIFF),
    ]
    return make_scene(_cornell_walls(), spheres, _cornell_light_sampler())


def veach_mis() -> Scene:
    """Veach's multiple-importance-sampling test scene (Veach & Guibas 95,
    fig. 9.6), rebuilt in Cornell units for the default camera: four
    glossy plates of increasing Phong exponent viewed at grazing angle,
    lit by four emitters whose areas span ~150x at roughly equal power.

    Light sampling alone is good for the small bright lights but terrible
    for the big light reflected in a sharp lobe; BSDF sampling is the
    reverse — estimator="mis" (balance heuristic) is the scene's point.
    Object ids: floor 0, back wall 1, plates 2-5 (quads), lights 6-9
    (quads). scene.light marks the big light; NEE runs over the list."""
    rects = [
        (AX_Y, 0.0, (1.0, 0.0), (99.0, 170.0), (0.45, 0.45, 0.45), _ZERO, DIFF),
        (AX_Z, 0.0, (1.0, 0.0), (99.0, 120.0), (0.18, 0.18, 0.22), _ZERO, DIFF),
    ]
    # Plates: amphitheater of 70x12 strips pitched ~20 degrees (rising
    # toward the back) so they reflect the light row into the camera;
    # exponent ladder front-to-back 30 -> 2000.
    pitch = math.radians(20.0)
    dv = (0.0, 12.0 * math.sin(pitch), -12.0 * math.cos(pitch))
    plate_alb = (0.85, 0.85, 0.85)
    plates = []
    for i, n_exp in enumerate((30.0, 120.0, 500.0, 2000.0)):
        corner = (15.0, 4.0 + 11.0 * i, 101.0 - 18.0 * i)
        plates.append(
            (corner, (70.0, 0.0, 0.0), dv, plate_alb, _ZERO, GLOS, n_exp)
        )
    # Lights: areas 144 / 29 / 5.8 / 1.0 at ~equal total power (emission
    # scaled by 1/area), with the subtle color ramp of Veach's figure.
    sizes = (12.0, 5.4, 2.4, 1.0)
    centers_x = (20.0, 40.0, 60.0, 80.0)
    tints = (
        (1.0, 0.85, 0.6), (1.0, 1.0, 0.8), (0.8, 1.0, 0.9), (0.7, 0.85, 1.0)
    )
    power = 150.0
    lights_q = []
    ll_corner, ll_eu, ll_ev = [], [], []
    for s, cx, tint in zip(sizes, centers_x, tints):
        corner = (cx - s / 2.0, 70.0, 20.0 - s / 2.0)
        eu, ev = (s, 0.0, 0.0), (0.0, 0.0, s)
        e = tuple(power / (s * s) * t for t in tint)
        lights_q.append((corner, eu, ev, _ZERO, e, DIFF))
        ll_corner.append(corner)
        ll_eu.append(eu)
        ll_ev.append(ev)
    light = LightSampler(
        corner=jnp.asarray(ll_corner[0], jnp.float32),
        edge_u=jnp.asarray(ll_eu[0], jnp.float32),
        edge_v=jnp.asarray(ll_ev[0], jnp.float32),
        light_obj_id=jnp.asarray(6, jnp.int32),
    )
    lights = LightList(
        corner=jnp.asarray(ll_corner, jnp.float32),
        edge_u=jnp.asarray(ll_eu, jnp.float32),
        edge_v=jnp.asarray(ll_ev, jnp.float32),
        obj_id=jnp.asarray([6, 7, 8, 9], jnp.int32),
    )
    return make_scene(
        rects, [], light, quads=plates + lights_q, lights=lights
    )


PRESETS = {
    "cornell_box": cornell_box,
    "cornell_spheres": cornell_spheres,
    "cornell_spheres_roundlight": cornell_spheres_roundlight,
    "smallpt_original": smallpt_original,
    "smallpt_original_true": smallpt_original_true,
    "cornell_tilted_light": cornell_tilted_light,
    "cornell_alcove": cornell_alcove,
    "cornell_alcove_baffled": cornell_alcove_baffled,
    "cornell_twolights": cornell_twolights,
    "cornell_glossy": cornell_glossy,
    "veach_mis": veach_mis,
    "sphere_grid": sphere_grid,
    # Scalability ladder for the megakernel's looped sphere table
    # (ops/megakernel.py sphere_tab; PERF.md "scalable scenes"): unrolling
    # these would blow compile time, the table scans them at O(1) code size.
    "sphere_grid_256": lambda: sphere_grid(256),
    "sphere_grid_1024": lambda: sphere_grid(1024),
}


def get_scene(name: str) -> Scene:
    try:
        return PRESETS[name]()
    except KeyError:
        raise ValueError(
            f"unknown scene preset {name!r}; available: {sorted(PRESETS)}"
        ) from None
