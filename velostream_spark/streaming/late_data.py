"""Late-data strategies — reference ``LateDataStrategy``
(watermarks.rs:113-130): Drop, UpdatePreviousWindow{grace},
DeadLetterQueue, IncludeInNextWindow.

Spark mapping:

- **Drop** — ``withWatermark(ts, delay)`` + append mode: rows later than the
  watermark are dropped by the stateful operators (native).
- **UpdatePreviousWindow{grace}** — ``withWatermark(ts, grace)`` + *update*
  mode: a late row within grace re-fires its (already emitted) window with
  the corrected aggregate — Spark's update-mode re-emission is exactly the
  reference's late re-fire (tumbling.rs:64-120 historical windows).
- **DeadLetterQueue** — no native side-output; a ``foreachBatch`` splitter
  tracks the high watermark itself (max event time seen minus delay — the
  same bounded-out-of-orderness arithmetic as watermarks.rs:40-110) and
  routes late rows to a DLQ sink, on-time rows to the main sink.
- **IncludeInNextWindow** is processing-time reassignment — equivalent to
  windowing on processing time (``F.window(current_timestamp(), ...)``);
  provided for completeness via strategy naming only.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class LateDataStrategy(str, Enum):
    DROP = "drop"
    UPDATE_PREVIOUS = "update_previous_window"
    DEAD_LETTER = "dead_letter_queue"
    #: watermarks.rs:361: IncludeInNextWindow maps to LateDataAction::Process
    #: — the record is NOT dropped and simply re-enters normal window
    #: assignment (the name overpromises; nothing moves it to a "next"
    #: window). Spark equivalent: update output mode, where a late row
    #: within the state-retention watermark updates its own window.
    INCLUDE_IN_NEXT = "include_in_next_window"


def with_late_policy(sdf: DataFrame, ts_col: str, delay: str, strategy: LateDataStrategy):
    """Attach watermark + recommended output mode for the strategy.

    Returns (watermarked_df, output_mode): DROP → append (late rows dropped,
    windows emit once, on close); UPDATE_PREVIOUS → update (late rows within
    ``delay`` re-fire their window).
    """
    wm = sdf.withWatermark(ts_col, delay)
    if strategy is LateDataStrategy.DROP:
        return wm, "append"
    if strategy in (
        LateDataStrategy.UPDATE_PREVIOUS,
        LateDataStrategy.INCLUDE_IN_NEXT,
    ):
        return wm, "update"
    raise ValueError(f"{strategy} needs the DeadLetterSplitter foreachBatch path")


@dataclass
class DeadLetterSplitter:
    """foreachBatch splitter: late rows → DLQ path, rest → main path.

    Maintains its own bounded-out-of-orderness watermark (driver-side max
    event time − delay, persisted across batches in this object), mirroring
    the reference's per-source watermark tracking (watermarks.rs:40-56).
    Both outputs are parquet appends — at scale these are ordinary
    distributed writes; only the single max() scalar touches the driver.
    """

    ts_col: str
    delay_seconds: float
    main_path: str
    dlq_path: str
    watermark_epoch: float | None = None  # seconds

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if self.watermark_epoch is not None:
                is_late = F.unix_timestamp(F.col(self.ts_col)) < F.lit(
                    self.watermark_epoch
                )
            else:
                is_late = F.lit(False)
            batch_df.where(~is_late).write.mode("append").parquet(self.main_path)
            late = batch_df.where(is_late)
            if late.limit(1).count() > 0:
                late.write.mode("append").parquet(self.dlq_path)
            mx = batch_df.agg(
                F.max(F.unix_timestamp(F.col(self.ts_col)))
            ).collect()[0][0]
            if mx is not None:
                new_wm = float(mx) - self.delay_seconds
                if self.watermark_epoch is None or new_wm > self.watermark_epoch:
                    self.watermark_epoch = new_wm
        finally:
            batch_df.unpersist()
