"""Checkpoint / resume: batched simulation state save/restore.

The reference's nearest mechanisms are reset + keyframe save/load in the
viewer (SURVEY.md §5 — no trajectory checkpointing). Here snapshotting the
full batched state (qpos/qvel/act/ctrl/time/mocap/eq_active/warmstart +
plugin states) is a first-class op: CRC-guarded binary blobs packed by the
native C++ codec (native/statecodec.cpp) with a numpy fallback.

Format: <path>.json (manifest: model name, nenv, array specs) +
<path>.bin (codec blob).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

_STATE_FIELDS = ("time", "qpos", "qvel", "act", "ctrl", "qfrc_applied",
                 "xfrc_applied", "eq_active", "mocap_pos", "mocap_quat",
                 "qacc_warmstart", "rng")


def _flatten(server) -> Tuple[List[np.ndarray], List[dict]]:
    arrays, specs = [], []
    for f in _STATE_FIELDS:
        a = np.ascontiguousarray(np.asarray(getattr(server.d, f)))
        arrays.append(a)
        specs.append({"field": f, "dtype": str(a.dtype), "shape": list(a.shape)})
    leaves, treedef = jax.tree_util.tree_flatten(server.pstates)
    for i, leaf in enumerate(leaves):
        a = np.ascontiguousarray(np.asarray(leaf))
        arrays.append(a)
        specs.append({"field": f"__pstate_{i}", "dtype": str(a.dtype),
                      "shape": list(a.shape)})
    return arrays, specs


def _pack(arrays: List[np.ndarray]) -> bytes:
    from mujoco_ros_pkgs_tpu import native
    import ctypes
    lib = native.statecodec()
    if lib is None:                       # pure-python fallback
        out = bytearray(b"PYFB")
        for a in arrays:
            b = a.tobytes()
            out += len(b).to_bytes(8, "little") + b
        return bytes(out)
    n = len(arrays)
    sizes = (ctypes.c_uint64 * n)(*[a.nbytes for a in arrays])
    bufs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in arrays])
    cap = lib.codec_blob_size(sizes, n)
    out = ctypes.create_string_buffer(cap)
    written = lib.codec_pack(bufs, sizes, n, out, cap)
    if written == 0:
        raise RuntimeError("statecodec pack failed")
    return out.raw[:written]


def _unpack(blob: bytes, specs: List[dict]) -> List[np.ndarray]:
    from mujoco_ros_pkgs_tpu import native
    import ctypes
    arrays = [np.empty(s["shape"], dtype=np.dtype(s["dtype"])) for s in specs]
    if blob[:4] == b"PYFB":               # python-fallback blob
        off = 4
        for a in arrays:
            n = int.from_bytes(blob[off:off + 8], "little")
            off += 8
            a[...] = np.frombuffer(blob[off:off + n],
                                   dtype=a.dtype).reshape(a.shape)
            off += n
        return arrays
    lib = native.statecodec()
    if lib is None:
        raise RuntimeError("native codec unavailable for native blob")
    n = len(arrays)
    sizes = (ctypes.c_uint64 * n)(*[a.nbytes for a in arrays])
    bufs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in arrays])
    ok = lib.codec_unpack(blob, len(blob), bufs, sizes, n)
    if ok != n:
        raise RuntimeError("statecodec unpack failed (corrupt checkpoint?)")
    return arrays


def save(server, path: str) -> None:
    arrays, specs = _flatten(server)
    manifest = {
        "model": server.m.name,
        "nenv": server.nenv,
        "sim_time": server.sim_time,
        "arrays": specs,
    }
    with open(path + ".json", "w") as f:
        json.dump(manifest, f)
    with open(path + ".bin", "wb") as f:
        f.write(_pack(arrays))


def load(server, path: str) -> None:
    with open(path + ".json") as f:
        manifest = json.load(f)
    if manifest["nenv"] != server.nenv:
        raise ValueError(f"checkpoint nenv {manifest['nenv']} != server "
                         f"nenv {server.nenv}")
    if manifest["model"] != server.m.name:
        raise ValueError(f"checkpoint model '{manifest['model']}' != loaded "
                         f"model '{server.m.name}'")
    with open(path + ".bin", "rb") as f:
        blob = f.read()
    arrays = _unpack(blob, manifest["arrays"])
    nfield = len(_STATE_FIELDS)
    updates = {}
    for spec, a in zip(manifest["arrays"][:nfield], arrays[:nfield]):
        cur = getattr(server.d, spec["field"])
        updates[spec["field"]] = jnp.asarray(a).astype(cur.dtype)
    server.d = server.d.replace(**updates)
    leaves, treedef = jax.tree_util.tree_flatten(server.pstates)
    new_leaves = [jnp.asarray(a) for a in arrays[nfield:]]
    if len(new_leaves) != len(leaves):
        raise ValueError("checkpoint plugin-state mismatch")
    server.pstates = jax.tree_util.tree_unflatten(treedef, new_leaves)
