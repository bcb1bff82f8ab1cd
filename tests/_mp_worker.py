"""Worker for the 2-process jax.distributed tests (test_distributed.py).

Run as: python _mp_worker.py <pid> <nproc> <coordinator> [mode] [ckpt_dir]
mode: "plain" (sharded render) or "ckpt" (checkpointed spans over the
mesh — exercises the multi-host process_allgather in the span loop).
Prints one line: MP_RESULT mean=<f> traces=<f>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    coordinator_address=coord, num_processes=nproc, process_id=pid
)
assert jax.device_count() == 4 * nproc, jax.devices()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from small_pathtracer_tpu import RenderConfig, get_scene, make_camera  # noqa: E402
from small_pathtracer_tpu.parallel.mesh import make_mesh  # noqa: E402
from small_pathtracer_tpu.parallel.sharded import render_sharded  # noqa: E402

mode = sys.argv[4] if len(sys.argv) > 4 else "plain"
cfg = RenderConfig(width=16, height=16, spp=8, estimator="nee", seed=4)
mesh = make_mesh(jax.devices(), mesh_shape=(4, 2))
if mode == "ckpt":
    from small_pathtracer_tpu.utils.checkpoint import (
        render_with_checkpoints,
    )

    ckpt = os.path.join(sys.argv[5], f"mp_{pid}.ckpt")
    img, traces = render_with_checkpoints(
        get_scene("cornell_box"), make_camera(), cfg, ckpt, 2, mesh=mesh
    )
else:
    img, traces = render_sharded(
        get_scene("cornell_box"), make_camera(), cfg, mesh
    )
img = np.asarray(img)
print(f"MP_RESULT mean={img.mean():.9f} traces={traces}", flush=True)
