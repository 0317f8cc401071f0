"""Sharded checkpoint / resume for pod runs (orbax/tensorstore-backed).

The npz path (io/checkpoint.py) funnels every array through host memory of
one process — fine on a workstation, unusable for a 4M-vertex multi-host
run. Orbax writes each shard from the process that owns it (tensorstore
under the hood) and restores to any target sharding, so checkpoints scale
with the mesh and survive topology changes between save and load.

The reference has no checkpointing at all (SURVEY.md §5: all state rebuilt
per frame); this subsystem exists because a production framework needs
resumable long simulations.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..solver import SchwarzPreconditioner, SortMaps
from ..ops.apply import ApplyState


def save_tree(path: str, tree: Any) -> None:
    """Write a pytree of (possibly sharded) jax.Arrays; blocks until durable."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_tree(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree.

    `template` carries the target structure plus, per leaf, the sharding to
    restore into (concrete arrays or jax.ShapeDtypeStruct with .sharding).
    Without a template, arrays come back host-resident (numpy).
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is None:
        return ckptr.restore(path)
    return ckptr.restore(path, target=template)


def _fingerprint(pre: SchwarzPreconditioner) -> dict:
    fp = dataclasses.asdict(pre.cfg_effective)
    if pre.maps is not None:
        fp["num_verts"] = int(pre.maps.sorted_to_orig.shape[0])
    return fp


def save_solver_sharded(path: str, pre: SchwarzPreconditioner,
                        x: Optional[jax.Array] = None) -> None:
    """Solver state -> an orbax checkpoint directory + fingerprint json."""
    path = os.path.abspath(path)
    tree = {"frame_index": np.int64(pre.frame_index)}
    if pre.maps is not None:
        tree["maps"] = pre.maps._asdict()
    if pre.state is not None:
        tree["state"] = pre.state._asdict()
    if x is not None:
        tree["x"] = x
    save_tree(path, tree)
    with open(os.path.join(path, "fingerprint.json"), "w") as f:
        json.dump(_fingerprint(pre), f, sort_keys=True)


def load_solver_sharded(path: str, pre: SchwarzPreconditioner,
                        template: Optional[dict] = None) -> Optional[jax.Array]:
    """Restore solver state; validates the config/mesh fingerprint.

    `template`, if given, must mirror the saved tree structure with
    sharding-annotated leaves (e.g. from a previous prepare() on the target
    mesh) so each process reads only its shards.
    """
    path = os.path.abspath(path)
    fp_file = os.path.join(path, "fingerprint.json")
    if os.path.exists(fp_file):
        with open(fp_file) as f:
            saved = json.load(f)
        mine = _fingerprint(pre)
        saved_n = saved.pop("num_verts", None)
        mine_n = mine.pop("num_verts", None)
        saved_headroom = saved.pop("level_headroom", None)
        mine.pop("level_headroom", None)
        if saved != mine:
            raise ValueError(f"checkpoint config mismatch: {saved} vs {mine}")
        if saved_n is not None and mine_n is not None and saved_n != mine_n:
            raise ValueError(
                f"checkpoint mesh mismatch: num_verts {saved_n} vs {mine_n}"
            )
        if saved_headroom is not None:
            pre.cfg_effective = dataclasses.replace(
                pre.cfg, level_headroom=saved_headroom
            )
    tree = load_tree(path, template)
    pre.frame_index = int(tree["frame_index"])
    if "maps" in tree:
        pre.maps = SortMaps(**tree["maps"])
    if "state" in tree:
        pre.state = ApplyState(**tree["state"])
    return tree.get("x")
