"""EMIT CHANGES / EMIT FINAL → Spark output-mode mapping.

Reference semantics (ast.rs:152-163 ``EmitMode``; defaults at
select.rs:490-501): a windowed query defaults to EMIT FINAL (emit once per
window, on close); a non-windowed query defaults to EMIT CHANGES (emit the
updated row per input record).

Spark mapping:

| query shape            | EMIT CHANGES            | EMIT FINAL                   |
|------------------------|-------------------------|------------------------------|
| stateless (no agg)     | append                  | append (same rows either way)|
| windowed agg           | update (per-batch delta)| append + watermark (on close)|
| non-windowed agg       | update                  | complete (flush at end — the |
|                        |                         | reference flushes when the   |
|                        |                         | bounded source is exhausted, |
|                        |                         | engine.rs:1316)              |

Cadence delta, documented: the reference emits *per record*; Spark's update
mode emits the changed groups *per micro-batch*. The set of emitted
(group → value) transitions is the same when each micro-batch contains one
record, and the final converged state is identical in all cases.
"""

from __future__ import annotations

from enum import Enum


class EmitMode(str, Enum):
    CHANGES = "changes"
    FINAL = "final"


def default_emit_mode(has_window: bool) -> EmitMode:
    """Reference defaults (select.rs:490-501): window → FINAL, else CHANGES."""
    return EmitMode.FINAL if has_window else EmitMode.CHANGES


def output_mode_for(
    emit: EmitMode | None, has_window: bool, has_aggregation: bool
) -> str:
    """Spark ``outputMode`` for a query shape + EMIT mode (table above)."""
    if emit is None:
        emit = default_emit_mode(has_window)
    if not has_aggregation:
        return "append"
    if emit is EmitMode.CHANGES:
        return "update"
    return "append" if has_window else "complete"
