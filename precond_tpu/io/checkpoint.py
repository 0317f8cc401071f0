"""Checkpoint / resume of solver state.

The reference rebuilds everything per frame; its only cross-frame state is
the frame counter and the 17-frame-stale Morton sort (cpp:44-52). For long
simulations the useful persistent state is exactly that plus the solution
vector: everything is flat arrays, so an npz round-trip suffices (an
orbax-style checkpointer can be layered on the same tree).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.apply import ApplyState
from ..solver import SchwarzPreconditioner, SortMaps


def _flatten(prefix: str, tree: Any, out: Dict[str, np.ndarray]) -> None:
    if hasattr(tree, "_asdict"):
        for k, v in tree._asdict().items():
            _flatten(f"{prefix}{k}.", v, out)
    else:
        out[prefix.rstrip(".")] = np.asarray(tree)


def save_solver(path: str, pre: SchwarzPreconditioner, x: Optional[jnp.ndarray] = None) -> None:
    """Persist sort maps, apply-state and (optionally) the solution vector."""
    arrays: Dict[str, np.ndarray] = {"frame_index": np.asarray(pre.frame_index)}
    if pre.maps is not None:
        _flatten("maps.", pre.maps, arrays)
    if pre.state is not None:
        _flatten("state.", pre.state, arrays)
    if x is not None:
        arrays["x"] = np.asarray(x)
    np.savez_compressed(path, **arrays)


def load_solver(path: str, pre: SchwarzPreconditioner) -> Optional[jnp.ndarray]:
    """Restore a solver checkpoint into `pre`; returns the solution if saved."""
    data = np.load(path)
    pre.frame_index = int(data["frame_index"])
    if "maps.sorted_to_orig" in data:
        pre.maps = SortMaps(
            sorted_to_orig=jnp.asarray(data["maps.sorted_to_orig"]),
            orig_to_sorted=jnp.asarray(data["maps.orig_to_sorted"]),
        )
    if "state.inv96" in data:
        pre.state = ApplyState(
            **{f: jnp.asarray(data[f"state.{f}"]) for f in ApplyState._fields}
        )
    return jnp.asarray(data["x"]) if "x" in data else None
