"""Benchmark: aggregate env-steps/s of the batched contact physics step.

Config 2 of the driver BASELINE (BASELINE.md): 4096 lockstep env instances of
a free-floating box with ground contacts, f32, jit(scan(vmap(step))) on one
chip. Prints one JSON line.

vs_baseline: the driver target is >1,000,000 aggregate env-steps/s on TPU
v4-16 (16 chips) → per-chip share 62,500 env-steps/s. vs_baseline is
value / 62,500 (>1 beats the per-chip target; the reference itself publishes
no numbers, BASELINE.md).
"""

import json
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mujoco_ros_pkgs_tpu.core import mjcf
    from mujoco_ros_pkgs_tpu.models import worlds
    from mujoco_ros_pkgs_tpu.ops import forward as fwd

    import os
    NENV = int(os.environ.get("BENCH_NENV", 4096))
    NSUB = int(os.environ.get("BENCH_NSUB", 50))   # steps per device call
    ROUNDS = int(os.environ.get("BENCH_ROUNDS", 10))
    ITERS = int(os.environ.get("BENCH_ITERS", 8))

    # ALL setup on CPU (remote TPU backends pay one RPC per eager op);
    # the batched state ships to the accelerator in one device_put.
    cpu = jax.local_devices(backend="cpu")[0]
    accel = jax.devices()[0]
    with jax.default_device(cpu):
        m = mjcf.load_model_from_string(worlds.BOXES, dtype=jnp.float32)
        d1 = fwd.make_data(m, dtype=jnp.float32)
        d = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (NENV,) + x.shape), d1)
        # spread initial heights/velocities: contacts stay active and diverse
        key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, NENV)
        qpos = jnp.array(d.qpos)
        qpos = qpos.at[:, 2].set(0.15 + 0.2 * jax.random.uniform(key, (NENV,)))
        qvel = 0.5 * jax.random.normal(jax.random.fold_in(key, 1), (NENV, m.nv))
        d = d.replace(qpos=qpos, qvel=qvel.astype(jnp.float32), rng=keys)

    # solver work is the hot cost; these caps converge tightly (warmstarted
    # Newton needs 2-4 iters on this scene) while keeping the graph lean
    m = m.replace(opt=m.opt.replace(iterations=ITERS, ls_iterations=8))

    m = jax.device_put(m, accel)
    d = jax.device_put(d, accel)

    @partial(jax.jit, donate_argnums=0)
    def run(d):
        def body(d, _):
            d = jax.vmap(lambda dd: fwd.step(m, dd))(d)
            return d, None
        d, _ = jax.lax.scan(body, d, None, length=NSUB)
        return d

    # warmup/compile
    import sys, time as _t
    t0 = _t.perf_counter()
    d = run(d)
    jax.block_until_ready(d.qpos)
    print(f"compile+first-run: {_t.perf_counter()-t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        d = run(d)
    jax.block_until_ready(d.qpos)
    dt = time.perf_counter() - t0

    env_steps = NENV * NSUB * ROUNDS
    rate = env_steps / dt
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / 62500.0, 3),
    }))


if __name__ == "__main__":
    main()
