"""Debug-mode numerical guards.

Reference analogues: stencil-overflow clamp + printf (cpp:312-316),
identity-fill of singular blocks (cpp:1365-1367), zero-safe Normalize
(SeMath.h:149-156). Here: explicit NaN/Inf sentinels and hierarchy
overflow checks that can wrap any solve in debug runs (SURVEY.md §5).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from ..ops.apply import ApplyState


def check_finite(name: str, *arrays) -> List[str]:
    """Return a list of problem descriptions (empty = healthy)."""
    problems = []
    for i, a in enumerate(arrays):
        a = np.asarray(a)
        if not np.all(np.isfinite(a)):
            bad = int((~np.isfinite(a)).sum())
            problems.append(f"{name}[{i}]: {bad}/{a.size} non-finite values")
    return problems


def validate_apply_state(state: ApplyState) -> List[str]:
    """Sanity-check a prepared preconditioner state."""
    from ..ops.pallas.packed_symv import (
        DenseInverseCM, PackedInverse, PackedInverseCM,
    )

    if isinstance(state.inv96, DenseInverseCM):
        return check_finite("inv96.cm", state.inv96.m) + (
            ["hierarchy overflow"] if bool(state.overflow) else []
        )
    if isinstance(state.inv96, (PackedInverse, PackedInverseCM)):
        # packed storage keeps one copy of each off-diagonal element, so
        # the applied operator is symmetric by construction — only
        # finiteness can go wrong
        problems = check_finite("inv96.packed", state.inv96.f, state.inv96.dg)
    else:
        problems = check_finite("inv96", state.inv96)
        inv = np.asarray(state.inv96)
        asym = np.abs(inv - np.swapaxes(inv, 1, 2)).max()
        scale = max(np.abs(inv).max(), 1e-30)
        if asym > 1e-5 * scale:
            problems.append(f"inv96 asymmetry {asym:.3e} (scale {scale:.3e})")
    if bool(state.overflow):
        problems.append(
            "hierarchy overflow: a level exceeded its static capacity "
            "(raise SchwarzConfig.level_headroom)"
        )
    return problems


def assert_healthy(state: ApplyState) -> None:
    """Raise on an unhealthy prepared state.

    A real exception (not `assert`): these are runtime validity checks, and
    `python -O` strips asserts — a debug guard that silently disappears
    under -O is worse than none (ADVICE r4)."""
    problems = validate_apply_state(state)
    if problems:
        raise RuntimeError("; ".join(problems))


def assert_system_finite(ell) -> None:
    """Abort on a poisoned INPUT system (NaN/Inf in diag or blocks).

    Checked separately from the prepared state: the inverse pass repairs
    transiently non-finite blocks (identity fill, the reference's
    cpp:1365-1367 treatment), so a poisoned input could otherwise
    factorize to a finite-but-meaningless preconditioner.
    """
    problems = check_finite("system.diag", ell.diag)
    blocks = getattr(ell, "blocks", None)
    if blocks is not None:
        problems += check_finite("system.blocks", blocks)
    if problems:
        raise ValueError("; ".join(problems))
