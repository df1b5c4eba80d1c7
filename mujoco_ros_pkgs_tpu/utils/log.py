"""Named, per-subsystem loggers — the rosconsole analogue.

The reference configures per-logger levels via a rosconsole config file
(mujoco_ros/config/rosconsole.config) and logs through named debug loggers
("mujoco", "sensors", "mujoco_ros_plugin_loader", "offscreen_rendering", ...)
throughout mujoco_env.cpp. Here every subsystem logs through
``get_logger(<subsystem>)`` — children of one ``mujoco_ros_pkgs_tpu`` root —
and ``configure()`` applies a {logger: level} map from CLI/config (the
rosconsole.config analogue).
"""

from __future__ import annotations

import logging
import sys
from typing import Dict, Optional

ROOT = "mujoco_ros_pkgs_tpu"

_FORMAT = "[%(levelname)s] [%(asctime)s] [%(name)s]: %(message)s"
_configured = False


def get_logger(subsystem: str = "") -> logging.Logger:
    """Logger for a subsystem ('server', 'physics', 'render', 'plugins',
    'dist', ...). Empty -> the package root logger."""
    name = f"{ROOT}.{subsystem}" if subsystem else ROOT
    return logging.getLogger(name)


def configure(levels: Optional[Dict[str, str]] = None,
              default_level: str = "WARNING",
              stream=None) -> None:
    """Install a stderr handler on the package root and apply per-logger
    levels, e.g. {"server": "DEBUG", "render": "ERROR"}. Idempotent: the
    handler is added once; levels are re-applied on every call (so a running
    server can be re-configured, like rosconsole's reconfigure)."""
    global _configured
    root = logging.getLogger(ROOT)
    if not _configured:
        h = logging.StreamHandler(stream or sys.stderr)
        h.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        root.addHandler(h)
        root.propagate = False
        _configured = True
    root.setLevel(getattr(logging, default_level.upper(), logging.WARNING))
    for sub, lvl in (levels or {}).items():
        name = sub if sub.startswith(ROOT) else f"{ROOT}.{sub}"
        logging.getLogger(name).setLevel(
            getattr(logging, str(lvl).upper(), logging.WARNING))


def parse_level_spec(spec: str) -> Dict[str, str]:
    """Parse 'server=debug,render=error' (the CLI form of the
    rosconsole.config level map)."""
    levels: Dict[str, str] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"bad log level spec '{part}' (want name=level)")
        name, lvl = part.split("=", 1)
        levels[name.strip()] = lvl.strip()
    return levels
