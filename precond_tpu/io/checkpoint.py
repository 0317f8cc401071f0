"""Checkpoint / resume of solver state.

The reference rebuilds everything per frame; its only cross-frame state is
the frame counter and the 17-frame-stale Morton sort (cpp:44-52). For long
simulations the useful persistent state is exactly that plus the solution
vector: everything is flat arrays, so an npz round-trip suffices. For
multi-host pod runs use io/sharded.py (tensorstore/orbax-style per-shard
files over the same tree).

bfloat16 arrays (cfg.inverse_dtype="bfloat16") are stored as uint16 views
with a recorded dtype — np.savez would otherwise silently write them as
raw void ('|V2') which jnp.asarray cannot load back.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from ..ops.apply import ApplyState
from ..solver import SchwarzPreconditioner, SortMaps

_EXOTIC = {np.dtype(ml_dtypes.bfloat16): np.uint16}


def _flatten(prefix: str, tree: Any, out: Dict[str, np.ndarray],
             dtypes: Dict[str, str]) -> None:
    if hasattr(tree, "_asdict"):
        for k, v in tree._asdict().items():
            _flatten(f"{prefix}{k}.", v, out, dtypes)
    else:
        a = np.asarray(tree)
        key = prefix.rstrip(".")
        if a.dtype in _EXOTIC:
            dtypes[key] = a.dtype.name
            a = a.view(_EXOTIC[a.dtype])
        out[key] = a


def _restore(data, key: str, dtypes: Dict[str, str]) -> jnp.ndarray:
    a = data[key]
    if key in dtypes:
        a = a.view(np.dtype(dtypes[key]))
    return jnp.asarray(a)


def _fingerprint(pre: SchwarzPreconditioner) -> Dict[str, Any]:
    # cfg_effective (not cfg): overflow recovery may have grown
    # level_headroom, and the saved state's level geometry follows it.
    fp: Dict[str, Any] = dataclasses.asdict(pre.cfg_effective)
    if pre.maps is not None:
        fp["num_verts"] = int(pre.maps.sorted_to_orig.shape[0])
    return fp


def save_solver(path: str, pre: SchwarzPreconditioner, x: Optional[jnp.ndarray] = None) -> None:
    """Persist sort maps, apply-state and (optionally) the solution vector."""
    arrays: Dict[str, np.ndarray] = {"frame_index": np.asarray(pre.frame_index)}
    dtypes: Dict[str, str] = {}
    if pre.maps is not None:
        _flatten("maps.", pre.maps, arrays, dtypes)
    if pre.state is not None:
        _flatten("state.", pre.state, arrays, dtypes)
        # record the CONCRETE inverse container type: PackedInverse and
        # PackedInverseCM have identical field names but different DOF
        # conventions — reconstructing the wrong one would silently apply
        # the wrong preconditioner (ADVICE r4)
        arrays["__inv_type__"] = np.frombuffer(
            type(pre.state.inv96).__name__.encode(), dtype=np.uint8
        ).copy()
    if x is not None:
        _flatten("x", x, arrays, dtypes)
    arrays["__dtypes__"] = np.frombuffer(
        json.dumps(dtypes).encode(), dtype=np.uint8
    ).copy()
    arrays["__fingerprint__"] = np.frombuffer(
        json.dumps(_fingerprint(pre), sort_keys=True).encode(), dtype=np.uint8
    ).copy()
    np.savez_compressed(path, **arrays)


def load_solver(path: str, pre: SchwarzPreconditioner) -> Optional[jnp.ndarray]:
    """Restore a solver checkpoint into `pre`; returns the solution if saved.

    Refuses a checkpoint whose config/mesh fingerprint disagrees with the
    receiving solver — a mismatched N or level geometry would otherwise load
    silently and fail later with shape errors or wrong preconditioning.
    """
    data = np.load(path)
    dtypes: Dict[str, str] = {}
    if "__dtypes__" in data:
        dtypes = json.loads(bytes(data["__dtypes__"].tobytes()).decode())
    if "__fingerprint__" in data:
        saved = json.loads(bytes(data["__fingerprint__"].tobytes()).decode())
        mine = _fingerprint(pre)
        saved_n = saved.pop("num_verts", None)
        mine_n = mine.pop("num_verts", None)
        # level_headroom may legitimately differ: a checkpoint written after
        # overflow recovery restores its grown headroom into the receiver.
        saved_headroom = saved.pop("level_headroom", None)
        mine.pop("level_headroom", None)
        if saved != mine:
            raise ValueError(
                f"checkpoint config mismatch: saved {saved} vs solver {mine}"
            )
        if saved_n is not None and mine_n is not None and saved_n != mine_n:
            raise ValueError(
                f"checkpoint mesh mismatch: saved num_verts={saved_n} vs {mine_n}"
            )
        if saved_headroom is not None:
            pre.cfg_effective = dataclasses.replace(
                pre.cfg, level_headroom=saved_headroom
            )
    pre.frame_index = int(data["frame_index"])
    if "maps.sorted_to_orig" in data:
        pre.maps = SortMaps(
            sorted_to_orig=_restore(data, "maps.sorted_to_orig", dtypes),
            orig_to_sorted=_restore(data, "maps.orig_to_sorted", dtypes),
        )
    if "state.inv96" in data or "state.inv96.f" in data or "state.inv96.m" in data:
        from ..ops.pallas.packed_symv import (
            DenseInverseCM, PackedInverse, PackedInverseCM,
        )

        by_name = {
            t.__name__: t for t in (PackedInverse, PackedInverseCM, DenseInverseCM)
        }
        inv_type = None
        if "__inv_type__" in data:
            inv_type = bytes(data["__inv_type__"].tobytes()).decode()
        fields = {}
        for f in ApplyState._fields:
            if f == "inv96" and "state.inv96.f" in data:
                # packed-symmetric inverse (saved as its nested fields);
                # dispatch on the RECORDED type — the row-major and
                # comp-major packings share field names but not DOF
                # conventions, so guessing would be silently wrong
                cls = by_name.get(inv_type or "PackedInverse")
                if cls is None or cls is DenseInverseCM:
                    raise ValueError(
                        f"checkpoint inv96 type {inv_type!r} does not match "
                        "its saved packed fields"
                    )
                fields[f] = cls(
                    **{k: _restore(data, f"state.inv96.{k}", dtypes)
                       for k in cls._fields}
                )
            elif f == "inv96" and "state.inv96.m" in data:
                fields[f] = DenseInverseCM(
                    m=_restore(data, "state.inv96.m", dtypes)
                )
            else:
                fields[f] = _restore(data, f"state.{f}", dtypes)
        pre.state = ApplyState(**fields)
    return _restore(data, "x", dtypes) if "x" in data else None
