"""URDF/transmission parsing + soft joint limits for the ros_control bridge.

Mirrors the reference semantics: the plugin blocks on a URDF
(mujoco_ros_control/src/mujoco_ros_control_plugin.cpp:198-232), one joint per
<transmission> with the control method chosen by its hardwareInterface
(default_robot_hw_sim.cpp:84-158, *_PID when PID gains exist :195-214), and
URDF hard+soft limits enforced via joint_limits_interface handles
(default_robot_hw_sim.cpp:340-446)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from mujoco_ros_pkgs_tpu.models import worlds
from mujoco_ros_pkgs_tpu.plugins import urdf as urdf_mod
from mujoco_ros_pkgs_tpu.plugins.ros_control import ControlMethod, RosControlPlugin
from mujoco_ros_pkgs_tpu.server import MujocoServer


ARM_URDF = """
<robot name="arm7">
  <joint name="j0" type="revolute">
    <limit lower="-3" upper="3" effort="50" velocity="2.5"/>
  </joint>
  <joint name="j4" type="revolute">
    <limit lower="-3" upper="3" effort="20" velocity="4"/>
  </joint>
  <joint name="j5" type="revolute">
    <limit lower="-2" upper="2" effort="10" velocity="3"/>
    <safety_controller soft_lower_limit="-1.5" soft_upper_limit="1.5"
                       k_position="20" k_velocity="8"/>
  </joint>
  <transmission name="t0">
    <type>transmission_interface/SimpleTransmission</type>
    <joint name="j0">
      <hardwareInterface>hardware_interface/EffortJointInterface</hardwareInterface>
    </joint>
  </transmission>
  <transmission name="t4">
    <type>transmission_interface/SimpleTransmission</type>
    <joint name="j4">
      <hardwareInterface>hardware_interface/PositionJointInterface</hardwareInterface>
    </joint>
  </transmission>
  <transmission name="t5">
    <type>transmission_interface/SimpleTransmission</type>
    <joint name="j5">
      <hardwareInterface>hardware_interface/EffortJointInterface</hardwareInterface>
    </joint>
    <actuator name="a5"><mechanicalReduction>2</mechanicalReduction></actuator>
  </transmission>
</robot>
"""


def test_parse_urdf_limits_and_transmissions():
    u = urdf_mod.parse_urdf(ARM_URDF)
    assert u.name == "arm7"
    assert u.joint_limits["j0"].effort == 50
    assert u.joint_limits["j0"].velocity == 2.5
    assert not u.joint_limits["j0"].has_soft
    j5 = u.joint_limits["j5"]
    assert j5.has_soft and j5.soft_lower == -1.5 and j5.k_position == 20
    names = [(t.joint, t.hardware_interface) for t in u.transmissions]
    assert ("j0", "hardware_interface/EffortJointInterface") in names
    assert ("j4", "hardware_interface/PositionJointInterface") in names
    assert u.transmissions[2].mechanical_reduction == 2.0


def test_parse_urdf_errors():
    with pytest.raises(ValueError, match="expected <robot>"):
        urdf_mod.parse_urdf("<notrobot/>")
    with pytest.raises(ValueError, match="hardwareInterface"):
        urdf_mod.parse_urdf("""<robot name="x">
          <transmission name="t"><joint name="j"/></transmission></robot>""")
    with pytest.raises(ValueError, match="parse error"):
        urdf_mod.parse_urdf("<robot")


def test_joints_config_method_mapping():
    u = urdf_mod.parse_urdf(ARM_URDF)
    cfg = urdf_mod.joints_config_from_urdf(u)
    assert cfg["j0"]["method"] == "EFFORT"
    assert cfg["j4"]["method"] == "POSITION"
    assert cfg["j5"]["soft_limits"]["k_velocity"] == 8
    # PID gains upgrade POSITION -> POSITION_PID (default_robot_hw_sim.cpp:195-214)
    cfg = urdf_mod.joints_config_from_urdf(u, {"j4": [10, 0, 1, 2]})
    assert cfg["j4"]["method"] == "POSITION_PID"
    assert cfg["j4"]["pid"] == [10, 0, 1, 2]
    # no transmissions -> hard error (the reference blocks)
    with pytest.raises(ValueError, match="no transmissions"):
        urdf_mod.joints_config_from_urdf(
            urdf_mod.parse_urdf('<robot name="empty"/>'))


def test_urdf_driven_server_end_to_end():
    """BASELINE config 4 shape: the arm driven through interfaces defined
    entirely by a URDF (position + effort transmissions)."""
    p = RosControlPlugin({"robot_description": ARM_URDF})
    s = MujocoServer(worlds.ARM7, nenv=1, unpause=False, plugins=[p])
    i, plug = s._plugin_of(RosControlPlugin)
    assert sorted(
        plug.methods) == sorted([int(ControlMethod.EFFORT),
                                 int(ControlMethod.POSITION),
                                 int(ControlMethod.EFFORT)])
    # command: [j0 effort, j4 position, j5 effort] in the plugin's joint order
    order = [s.m.jnt_names[j] for j in plug.joint_ids]
    cmd = np.zeros(3, dtype=np.float32)
    cmd[order.index("j4")] = 0.6
    states = list(s.pstates)
    states[i] = dict(states[i], command=jnp.tile(jnp.asarray(cmd), (1, 1)))
    s.pstates = tuple(states)
    s.step(30)
    j4 = s.m.joint("j4")
    q = float(np.asarray(s.d.qpos)[0, s.m.jnt_qposadr[j4]])
    assert abs(q - 0.6) < 1e-3, q


def test_missing_joint_quarantines():
    bad = ARM_URDF.replace('name="j0"', 'name="ghost_joint"')
    p = RosControlPlugin({"robot_description": bad})
    s = MujocoServer(worlds.ARM7, nenv=1, unpause=False, plugins=[p])
    # plugin must be quarantined, not crash the server (plugin_utils.h:69-78)
    assert p.load_error and "ghost_joint" in p.load_error
    assert s.step(2).success


def test_soft_limit_effort_clamp():
    """joint_limits_interface effort soft limit: past the soft bound the
    admissible effort interval excludes the commanded push
    (default_robot_hw_sim.cpp:340-446)."""
    from mujoco_ros_pkgs_tpu.core import mjcf
    from mujoco_ros_pkgs_tpu.ops import forward as fwd

    m = mjcf.load_model_from_string(worlds.ARM7)
    p = RosControlPlugin({"robot_description": ARM_URDF})
    assert p.load(m, None)
    d = fwd.make_data(m)
    # place j5 beyond its soft upper limit (1.5), at rest
    j5 = m.joint("j5")
    d = d.replace(qpos=d.qpos.at[m.jnt_qposadr[j5]].set(1.8))
    ps = p.init_state(m, 1)
    k = [m.jnt_names[j] for j in p.joint_ids].index("j5")
    cmd = np.zeros(3)
    cmd[k] = 10.0   # push further out, at the effort limit
    ps = p.set_commands(ps, cmd)
    d2, _ = p.control(m, d, ps)
    e = float(np.asarray(d2.qfrc_applied)[m.jnt_dofadr[j5]])
    # expected: vel_max = clip(-k_p*(q - soft_hi), ±vel) = clip(-20*0.3) = -3
    # eff_max = clip(-k_v*(v - vel_max), ±eff) = clip(-8*(0+3)) = -10
    assert e <= -9.99, e     # fully reversed: drives back inside the band
    # inside the band the same command passes through at the effort limit
    d_in = d.replace(qpos=d.qpos.at[m.jnt_qposadr[j5]].set(0.0))
    d3, _ = p.control(m, d_in, ps)
    e_in = float(np.asarray(d3.qfrc_applied)[m.jnt_dofadr[j5]])
    assert abs(e_in - 10.0) < 1e-6, e_in


def test_soft_limit_position_interface():
    """Position-interface soft limit: target clamped to q + vel_bound*dt —
    the joint walks to the soft bound and stops there, not the hard bound."""
    u = urdf_mod.parse_urdf(ARM_URDF.replace(
        '<hardwareInterface>hardware_interface/EffortJointInterface'
        '</hardwareInterface>\n    </joint>\n    <actuator name="a5">'
        '<mechanicalReduction>2</mechanicalReduction></actuator>',
        '<hardwareInterface>hardware_interface/PositionJointInterface'
        '</hardwareInterface>\n    </joint>'))
    cfg = urdf_mod.joints_config_from_urdf(u)
    assert cfg["j5"]["method"] == "POSITION"
    p = RosControlPlugin({"joints": {"j5": cfg["j5"]}})
    s = MujocoServer(worlds.ARM7, nenv=1, unpause=False, plugins=[p])
    i, _ = s._plugin_of(RosControlPlugin)
    states = list(s.pstates)
    states[i] = dict(states[i], command=jnp.full((1, 1), 1.9))  # > soft 1.5
    s.pstates = tuple(states)
    s.step(600)
    j5 = s.m.joint("j5")
    q = float(np.asarray(s.d.qpos)[0, s.m.jnt_qposadr[j5]])
    assert q <= 1.52, q          # held at the soft bound
    assert q > 1.3, q            # but did walk up to it


def test_custom_hardware_sim_seam():
    """The RobotHWSim second-level plugin seam (robot_hw_sim.h:62 /
    mujoco_ros_control_plugin.cpp:126-147): a custom HardwareSim registered
    by type name replaces DefaultRobotHWSim inside the hosting plugin."""
    from mujoco_ros_pkgs_tpu.plugins.ros_control import (
        HardwareSim, register_hardware_sim)

    calls = {"init": 0}

    class ConstantEffortHW(HardwareSim):
        def init_sim(self, plugin, m):
            super().init_sim(plugin, m)
            calls["init"] += 1
            return True

        def write_sim(self, m, d, ps):
            dofs = np.array(self.plugin.dof_adr)
            eff = jnp.where(ps["estop"], 0.0, 3.0)
            qfrc = d.qfrc_applied.at[dofs].set(eff)
            return d.replace(qfrc_applied=qfrc), ps

    register_hardware_sim("test/ConstantEffortHW", ConstantEffortHW)
    p = RosControlPlugin({"robot_description": ARM_URDF,
                          "hardware": {"type": "test/ConstantEffortHW"}})
    s = MujocoServer(worlds.ARM7, nenv=1, unpause=False, plugins=[p])
    assert calls["init"] == 1
    assert type(p.hw).__name__ == "ConstantEffortHW"
    s.step(5)
    qf = np.asarray(s.d.qfrc_applied)[0, np.array(p.dof_adr)]
    np.testing.assert_allclose(qf, 3.0)
    # read_sim default implementation exposes the joint vectors
    js = p.hw.read_sim(s.m, jax.tree_util.tree_map(lambda x: x[0], s.d))
    assert set(js) == {"position", "velocity", "effort"}
    s.shutdown()


def test_unknown_hardware_sim_quarantines():
    p = RosControlPlugin({"robot_description": ARM_URDF,
                          "hardware": {"type": "no/SuchHW"}})
    s = MujocoServer(worlds.ARM7, nenv=1, unpause=False, plugins=[p])
    assert p.load_error and "no/SuchHW" in p.load_error
    assert s.step(2).success
    s.shutdown()
