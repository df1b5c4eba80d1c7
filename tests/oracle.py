"""Parity-test oracle: the `mujoco` pip package (CPU, double precision).

The reference pins MuJoCo 2.3.7 (mujoco_ros/CMakeLists.txt:61); the image ships
mujoco 3.10, which rejects some 2.3.7-era MJCF attributes. `sanitize_xml`
strips those so the reference worlds load into the oracle unmodified semantics.
"""

import xml.etree.ElementTree as ET

import mujoco
import numpy as np

REF_WORLDS = "/root/reference/mujoco_ros/test"
SENSOR_WORLDS = "/root/reference/mujoco_ros_sensors/test"

# attributes valid in 2.3.7 but removed in 3.x: (tag, attr)
_LEGACY_ATTRS = [("option", "collision")]


def sanitize_xml(xml: str) -> str:
    root = ET.fromstring(xml)
    for tag, attr in _LEGACY_ATTRS:
        for e in root.iter(tag):
            e.attrib.pop(attr, None)
    return ET.tostring(root, encoding="unicode")


def load_oracle(path: str) -> mujoco.MjModel:
    with open(path) as f:
        xml = f.read()
    return mujoco.MjModel.from_xml_string(sanitize_xml(xml))


def load_oracle_string(xml: str) -> mujoco.MjModel:
    return mujoco.MjModel.from_xml_string(sanitize_xml(xml))


def rollout(mm: mujoco.MjModel, nsteps: int, qpos0=None, qvel0=None, ctrl=None):
    """Step the oracle, recording (qpos, qvel) trajectories."""
    dd = mujoco.MjData(mm)
    if qpos0 is not None:
        dd.qpos[:] = qpos0
    if qvel0 is not None:
        dd.qvel[:] = qvel0
    qpos, qvel = [], []
    for i in range(nsteps):
        if ctrl is not None:
            dd.ctrl[:] = ctrl[i] if np.ndim(ctrl) > 1 else ctrl
        mujoco.mj_step(mm, dd)
        qpos.append(dd.qpos.copy())
        qvel.append(dd.qvel.copy())
    return np.array(qpos), np.array(qvel)
