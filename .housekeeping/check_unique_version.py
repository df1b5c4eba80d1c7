#!/usr/bin/env python3
"""Enforce a single version across pyproject.toml and the package __init__,
mirroring the reference's .housekeeping/check_unique_version (which keeps the
5 catkin package.xml versions in lockstep)."""

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    pyproject = (ROOT / "pyproject.toml").read_text()
    init = (ROOT / "mujoco_ros_pkgs_tpu" / "__init__.py").read_text()
    v1 = re.search(r'^version\s*=\s*"([^"]+)"', pyproject, re.M)
    v2 = re.search(r'^__version__\s*=\s*"([^"]+)"', init, re.M)
    if not v1 or not v2:
        print("version string missing", file=sys.stderr)
        return 1
    if v1.group(1) != v2.group(1):
        print(f"version mismatch: pyproject={v1.group(1)} "
              f"__init__={v2.group(1)}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
