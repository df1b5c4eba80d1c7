"""Step-level trajectory parity: Pallas kernel on the REAL TPU chip vs the
reference jnp Newton solver on CPU (identical f32 program, no chip compile
of the slow-to-compile jnp while_loop path — measured >50 min on the tunnel).
The on-hardware complement to tests/test_solver_tpu.py (whose kernel coverage
runs the cone math and a tiny interpret-mode solve on CPU; the full unrolled
kernel compiles only on the chip in reasonable time).

Usage:  python scripts/chip_parity.py  [scene ...]
Scenes default to boxes, arm7, condim4, condim6, pile.
"""

import sys
import subprocess
import json
import os

SCENES = ["boxes", "arm7", "condim4", "condim6", "pile"]

CHILD = r"""
import os, sys, json
import numpy as np
import jax
if os.environ.get("MRP_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")   # axon ignores the env var
import jax.numpy as jnp
from mujoco_ros_pkgs_tpu.utils import backend
backend.ensure_cpu_backend()
from mujoco_ros_pkgs_tpu.core import mjcf
from mujoco_ros_pkgs_tpu.models import worlds
from mujoco_ros_pkgs_tpu.ops import forward as fwd

CONDIM4 = worlds.BOXES.replace('friction="1 0.005 0.0001"',
                               'friction="0.8 0.01 0.0001" condim="4"')
CONDIM6 = worlds.BOXES.replace('friction="1 0.005 0.0001"',
                               'friction="0.8 0.01 0.0001" condim="6"')
XML = dict(boxes=worlds.BOXES, arm7=worlds.ARM7, pile=worlds.PILE,
           condim4=CONDIM4, condim6=CONDIM6)[sys.argv[1]]

m = mjcf.load_model_from_string(XML, dtype=jnp.float32)
m = m.replace(opt=m.opt.replace(iterations=8, ls_iterations=8))
d = fwd.make_data(m, dtype=jnp.float32)
nenv = 256
d = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (nenv,) + x.shape), d)
key = jax.random.PRNGKey(0)
d = d.replace(rng=jax.random.split(key, nenv),
              qvel=(0.1 * jax.random.normal(key, (nenv, m.nv))
                    ).astype(jnp.float32))
accel = jax.devices()[0]
m = jax.device_put(m, accel); d = jax.device_put(d, accel)
step = jax.jit(jax.vmap(lambda e: fwd.step(m, e)))
for _ in range(int(sys.argv[2])):
    d = step(d)
jax.block_until_ready(d.qpos)
np.save(sys.argv[3], np.asarray(d.qpos))
np.save(sys.argv[3] + "v", np.asarray(d.qvel))
"""


def main():
    scenes = sys.argv[1:] or SCENES
    nsteps = os.environ.get("PARITY_STEPS", "100")
    results = {}
    for scene in scenes:
        outs = {}
        for mode in ("1", "0"):
            env = dict(os.environ, MRP_PALLAS_SOLVER=mode)
            if mode == "0":
                # reference path runs on CPU: same f32 program, and the
                # while_loop-heavy jnp solver compiles in seconds there
                env["JAX_PLATFORMS"] = "cpu"
                env["MRP_FORCE_CPU"] = "1"
            out = f"/tmp/parity_{scene}_{mode}.npy"
            r = subprocess.run([sys.executable, "-c", CHILD, scene, nsteps,
                                out], env=env, capture_output=True, text=True)
            if r.returncode != 0:
                print(f"{scene} mode={mode} FAILED:\n{r.stderr[-2000:]}")
                results[scene] = "crash"
                break
            outs[mode] = out
        else:
            import numpy as np
            qk, qj = np.load(outs["1"]), np.load(outs["0"])
            vk, vj = np.load(outs["1"] + "v.npy"), np.load(outs["0"] + "v.npy")
            finite = bool(np.isfinite(qk).all() and np.isfinite(vk).all())
            qerr = float(np.max(np.abs(qk - qj)))
            verr = float(np.max(np.abs(vk - vj)))
            results[scene] = dict(finite=finite, qpos_maxerr=qerr,
                                  qvel_maxerr=verr)
            print(f"{scene}: finite={finite} qpos_err={qerr:.2e} "
                  f"qvel_err={verr:.2e}")
    print(json.dumps(results))
    return 0 if all(isinstance(v, dict) and v["finite"]
                    for v in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
