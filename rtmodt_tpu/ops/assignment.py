"""Linear assignment on device (greedy) and host (C++ LAPJV).

The reference solves association with the ``lap`` C++ Jonker-Volgenant solver
when installed, else a greedy NumPy argmax loop (reference
``src/tracking/tracker.py:163-194``; SURVEY.md N4).  The TPU framework offers:

  * ``greedy_assign`` - an exact greedy matcher as a ``lax.while_loop`` over a
    fixed-shape similarity matrix, running inside the jitted tracking step
    (no host round-trip).  Greedy = repeatedly take the globally best
    (row, col) pair above the threshold, mask its row+column.
  * the host-side C++ LAPJV solver in ``rtmodt_tpu.native`` (optimal JV
    assignment, used as test arbiter and for ``assignment: lapjv`` mode).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AssignResult(NamedTuple):
    row_to_col: jnp.ndarray  # (R,) int32, -1 if row unmatched
    col_to_row: jnp.ndarray  # (C,) int32, -1 if col unmatched
    rounds: jnp.ndarray      # () int32 mutual-best rounds taken (diagnostic)


def greedy_assign(
    similarity: jnp.ndarray,
    threshold: float,
    row_valid: jnp.ndarray | None = None,
    col_valid: jnp.ndarray | None = None,
) -> AssignResult:
    """Greedy maximum-similarity assignment over a (R, C) matrix.

    Matches are taken in descending similarity order; a match requires
    ``similarity >= threshold`` (the reference's greedy/lapjv accept rule,
    tracker.py:188 / :170).  Invalid rows/cols never match.  Implemented as
    parallel mutual-best rounds (identical result, see comment below); the
    while_loop ends as soon as no pair clears the threshold - typically 2-4
    rounds, min(R, C) worst case.
    """
    r, c = similarity.shape
    neg = jnp.float32(-1e9)
    # NaN containment: jnp.max(sim) is NaN if ANY entry is NaN, which would
    # end the loop with zero matches for the whole frame - one poisoned
    # box/feature must not disable association for every other pair
    sim = jnp.nan_to_num(similarity.astype(jnp.float32), nan=-1e9)
    if row_valid is not None:
        sim = jnp.where(row_valid[:, None], sim, neg)
    if col_valid is not None:
        sim = jnp.where(col_valid[None, :], sim, neg)
    # Parallel mutual-best rounds == sequential global-max greedy (for
    # distinct similarities): the global max pair is mutually best, and
    # removing any OTHER mutually-best pair never affects it - so committing
    # every mutually-best pair per round reproduces greedy's matching in
    # O(rounds) VPU sweeps instead of min(r, c) sequential argmax steps.
    # With argmax's first-index tie-break, the lexicographically smallest
    # global-max entry is always mutual, so every round makes progress.
    def cond(carry):
        sim, _, _, it = carry
        return (it < min(r, c)) & (jnp.max(sim) >= threshold)

    def body(carry):
        sim, row_to_col, col_to_row, it = carry
        row_best = jnp.argmax(sim, axis=1).astype(jnp.int32)   # (R,)
        col_best = jnp.argmax(sim, axis=0).astype(jnp.int32)   # (C,)
        row_val = jnp.max(sim, axis=1)
        mutual = (col_best[row_best] == jnp.arange(r, dtype=jnp.int32)) & \
            (row_val >= threshold)
        # commit all mutual pairs at once
        row_to_col = jnp.where(mutual, row_best, row_to_col)
        col_to_row = col_to_row.at[jnp.where(mutual, row_best, c)].set(
            jnp.arange(r, dtype=jnp.int32), mode="drop")
        row_gone = mutual
        col_gone = jnp.zeros((c,), bool).at[jnp.where(mutual, row_best, c)].set(
            True, mode="drop")
        sim = jnp.where(row_gone[:, None] | col_gone[None, :], neg, sim)
        return sim, row_to_col, col_to_row, it + 1

    init = (
        sim,
        jnp.full((r,), -1, dtype=jnp.int32),
        jnp.full((c,), -1, dtype=jnp.int32),
        jnp.int32(0),
    )
    # NOTE: unrolling the first rounds (the ops/nms.py::_greedy_suppress
    # trick) was MEASURED SLOWER here - 0.601 vs 0.526 ms/frame for the
    # K=64 chunk program: this loop runs once per frame inside the tracker
    # scan and its body (two (R, C) argmax sweeps + scatters) costs more
    # than the loop overhead, so unconditional unrolled rounds lose to the
    # data-dependent early exit (docs/PERF_NOTES.md round 5).
    _, row_to_col, col_to_row, rounds = jax.lax.while_loop(cond, body, init)
    return AssignResult(row_to_col, col_to_row, rounds)


def greedy_assign_rounds(
    similarity: jnp.ndarray,
    threshold: float,
    row_valid: jnp.ndarray | None = None,
    col_valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mutual-best rounds until convergence (scaling diagnostic).

    Thin wrapper over ``greedy_assign`` - one implementation, so the
    diagnostic can never drift from the production loop."""
    return greedy_assign(similarity, threshold, row_valid, col_valid).rounds
