from mujoco_ros_pkgs_tpu.server.server import (  # noqa: F401
    AdminHashError, MujocoServer, PERCENT_REAL_TIME, STATUS_LOADING,
    STATUS_LOAD_REQUESTED, STATUS_RUNNING,
)
