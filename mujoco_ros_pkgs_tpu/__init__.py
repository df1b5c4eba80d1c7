"""mujoco_ros_pkgs_tpu — a TPU-native, batched MuJoCo-class simulation server framework.

A ground-up re-design of the capabilities of ubi-agni/mujoco_ros_pkgs (a C++/ROS1
wrapper around libmujoco 2.3.7) as an idiomatic JAX/XLA/Pallas framework:

- the physics engine itself (`mj_step`-class smooth dynamics, collisions, constraint
  solver) is implemented as pure, jit-compiled, batched JAX functions — thousands of
  environment instances step in lockstep on TPU;
- the ROS control plane (services / actions / topics) becomes an in-process typed
  control plane (`server/`) mutating batched state between device step batches;
- plugins (`mjcb_control` / `mjcb_passive` / last-stage callbacks) become ordered pure
  hook sets fused into the single compiled step (`plugins/`);
- multi-host scaling is done with `jax.sharding.Mesh` + collectives (`parallel/`),
  not threads and TCPROS.

Reference layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from mujoco_ros_pkgs_tpu.core.types import Model, Data, Option  # noqa: F401
from mujoco_ros_pkgs_tpu.core.mjcf import load_model, load_model_from_string  # noqa: F401
