"""Dynamic race audit + concurrency stress — the TSAN-equivalent for the
single-RLock discipline (the reference offers compile-time sanitizers,
cmake/Sanitizers.cmake:3-53; its runtime protection is the recursive
physics_thread_mutex_, mujoco_env.h:90,155)."""

import random
import threading
import time

import numpy as np
import pytest

from mujoco_ros_pkgs_tpu.models import worlds
from mujoco_ros_pkgs_tpu.msgs import BodyState, Pose
from mujoco_ros_pkgs_tpu.server import MujocoServer
from mujoco_ros_pkgs_tpu.server.server import LockDisciplineError


def test_unlocked_write_detected_while_running():
    s = MujocoServer(worlds.BOXES, nenv=2, unpause=True)
    s.start_physics_loop()
    try:
        time.sleep(0.2)
        with pytest.raises(LockDisciplineError):
            s.d = s.d          # naked state write while the loop runs
        with s._lock:
            s.d = s.d          # same write under the lock: fine
    finally:
        s.stop_physics_loop()
    # paused / loop stopped: permissive (single-threaded manual use)
    s.d = s.d


def test_concurrent_service_stress():
    """Hammer mutating+reading services from several threads while the
    physics loop steps; the audit must stay silent (every service holds the
    lock) and the state must stay finite — mirrors the reference's spinner
    threads mutating under the physics mutex."""
    s = MujocoServer(worlds.BOXES, nenv=4, unpause=True)
    s.start_physics_loop()
    errors = []

    def worker(seed):
        rng = random.Random(seed)
        try:
            for _ in range(30):
                op = rng.randrange(5)
                if op == 0:
                    s.get_body_state("box0" if "box0" in s.m.body_names
                                     else s.m.body_names[-1])
                elif op == 1:
                    s.apply_body_wrench(s.m.body_names[-1],
                                        force=(0, 0, rng.uniform(-1, 1)))
                elif op == 2:
                    s.get_solver_stats()
                elif op == 3:
                    s.set_gravity((0, 0, -9.81 + rng.uniform(-0.1, 0.1)))
                else:
                    s.get_physics_properties()
        except Exception as exc:   # noqa: BLE001 — collected for the assert
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    s.stop_physics_loop()
    assert not errors, errors
    assert np.all(np.isfinite(np.asarray(s.d.qpos)))
    assert s.sim_time > 0.0


def test_reload_and_clock_under_stepping(recwarn):
    """Regression for the round-4 deleted-array race: the step fn DONATES
    d's buffers, so sim_time/_publish_clock/_render_offscreen reads racing a
    reload/reset/step from another thread hit `Array has been deleted`
    unless they materialize under the lock. Spin the physics loop (which
    publishes the clock every chunk) while other threads reload, reset and
    read sim_time; no thread may raise."""
    s = MujocoServer(worlds.BOXES, nenv=2, unpause=True)
    ticks = []
    s.subscribe_clock(ticks.append)
    s.start_physics_loop()
    errors = []
    thread_errs = []

    # capture exceptions escaping ANY thread (the r4 failure surfaced only
    # as a PytestUnhandledThreadExceptionWarning, not a test failure)
    orig_hook = threading.excepthook
    threading.excepthook = lambda a: thread_errs.append(a.exc_value)

    def reader():
        try:
            for _ in range(200):
                _ = s.sim_time
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def mutator(seed):
        rng = random.Random(seed)
        try:
            for _ in range(10):
                if rng.random() < 0.5:
                    s.reset()
                else:
                    s.reload()
                time.sleep(0.002)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    try:
        threads = ([threading.Thread(target=reader) for _ in range(2)]
                   + [threading.Thread(target=mutator, args=(i,))
                      for i in range(2)])
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
    finally:
        s.stop_physics_loop()
        threading.excepthook = orig_hook
    assert not errors, errors
    assert not thread_errs, thread_errs
    assert ticks  # the loop published while being hammered
