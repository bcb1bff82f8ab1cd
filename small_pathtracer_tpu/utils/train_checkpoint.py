"""Training-state checkpoint / resume (orbax-backed).

utils/checkpoint.py makes RENDERS resumable; this module does the same for
OPTIMIZATION loops (fit): the complete training state is
(step, params pytree, optimizer state pytree), saved atomically with
orbax's StandardCheckpointer and guarded by a config fingerprint so a
stale checkpoint from a different run is ignored rather than restored.

Because every fit step draws its randomness from the fixed per-step seed
(counter RNG), resuming at step k reproduces the uninterrupted run's
remaining steps exactly — tested in tests/test_cli.py::TestTrainCheckpoint.

Works for any pytree pair: the jnp adjoint's (scene, opt_state), the
kernel path's material tables, optax NamedTuple states, etc.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

import jax


def _fingerprint_array(tag: str) -> np.ndarray:
    return np.frombuffer(
        hashlib.sha256(tag.encode()).digest(), dtype=np.uint8
    ).copy()


def _pad_empty(tree):
    """Orbax refuses zero-size arrays (e.g. a scene with 0 quads); swap
    them for 1-element placeholders — they carry no data, so the load side
    restores them from the target structure instead."""
    return jax.tree.map(
        lambda x: np.zeros((1,), np.asarray(x).dtype)
        if getattr(x, "size", 1) == 0 else x,
        tree,
    )


def _unpad_empty(like, restored):
    return jax.tree.map(
        lambda lk, rs: lk if getattr(lk, "size", 1) == 0 else rs,
        like, restored,
    )


def save_train_state(path: str, step: int, params, opt_state=None,
                     tag: str = "") -> None:
    """Atomically save (step, params, opt_state) to ``path`` (a directory;
    overwritten on each save). ``tag`` feeds the compatibility
    fingerprint — pass the same string when loading."""
    import orbax.checkpoint as ocp

    state = {
        # 0-d ndarray, NOT a bare np.int64 scalar: StandardCheckpointer's
        # restore-target validation rejects numpy scalar types (and
        # load_train_state would silently treat every checkpoint as
        # corrupt, restarting from step 0).
        "step": np.asarray(step, np.int64),
        "params": _pad_empty(params),
        "fingerprint": _fingerprint_array(tag),
    }
    if opt_state is not None:
        state["opt_state"] = _pad_empty(opt_state)
    ck = ocp.StandardCheckpointer()
    ck.save(os.path.abspath(path), state, force=True)
    ck.wait_until_finished()


def load_train_state(path: str, params_like, opt_state_like=None,
                     tag: str = ""):
    """Restore (step, params, opt_state) or None when the checkpoint is
    absent or its fingerprint mismatches ``tag``. params_like /
    opt_state_like provide the target pytree structure (NamedTuples etc.
    are reconstructed exactly)."""
    import orbax.checkpoint as ocp

    apath = os.path.abspath(path)
    if not os.path.isdir(apath):
        return None
    target = {
        "step": np.asarray(0, np.int64),  # see save_train_state
        "params": _pad_empty(params_like),
        "fingerprint": _fingerprint_array(""),
    }
    if opt_state_like is not None:
        target["opt_state"] = _pad_empty(opt_state_like)
    ck = ocp.StandardCheckpointer()
    try:
        state = ck.restore(apath, target)
    except Exception:  # noqa: BLE001 — corrupt/foreign checkpoint: rerun
        return None
    if not np.array_equal(
        np.asarray(state["fingerprint"]), _fingerprint_array(tag)
    ):
        return None
    step = int(state["step"])
    params = _unpad_empty(params_like, state["params"])
    opt_state = (
        _unpad_empty(opt_state_like, state["opt_state"])
        if opt_state_like is not None else None
    )
    return step, params, opt_state


def train_tag(cfg, extra: str = "", scene=None, cam=None,
              target=None) -> str:
    """Stable fingerprint tag: RenderConfig + context string + (optionally)
    the scene/camera leaves and the target image bytes — a checkpoint
    trained toward a different target or scene must NOT be restored."""
    import dataclasses
    import json

    h = hashlib.sha256()
    for leaf in jax.tree.leaves((scene, cam)):
        h.update(np.asarray(leaf).tobytes())
    if target is not None:
        h.update(np.asarray(target).tobytes())
    return (
        json.dumps(dataclasses.asdict(cfg), sort_keys=True)
        + "|" + extra + "|" + h.hexdigest()
    )
