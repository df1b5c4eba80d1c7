"""Build entry point for the native (C++) runtime components.

`python -m mujoco_ros_pkgs_tpu.native.build` compiles every .cpp in this
package to its lib<name>.so next to the source (the same artifacts the
on-demand ctypes loader in __init__.py produces lazily) and exits nonzero on
any compile failure — CI runs this so the suite actually exercises the native
paths instead of silently falling back to pure python.
"""

from __future__ import annotations

import glob
import os
import sys

from mujoco_ros_pkgs_tpu import native


def main() -> int:
    here = os.path.dirname(native.__file__)
    sources = sorted(glob.glob(os.path.join(here, "*.cpp")))
    if not sources:
        print("native: no sources found", file=sys.stderr)
        return 1
    failed = False
    for src in sources:
        name = os.path.splitext(os.path.basename(src))[0]
        try:
            out = native._build(name)
            print(f"native: built {out}")
        except Exception as exc:
            detail = getattr(exc, "stderr", b"")
            if isinstance(detail, bytes):
                detail = detail.decode(errors="replace")
            print(f"native: FAILED {name}: {exc}\n{detail}", file=sys.stderr)
            failed = True
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
