package graft.fe

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Entity-timestamp normalization re-creating the reference's tz handling
  * (feast utils.py:6-11 `make_tzaware` — tz-naive ⇒ assume UTC; tz-aware ⇒
  * convert to UTC — torture-tested by driver_test_data.py:53-75, which
  * cycles entity timestamps through tz-naive / UTC / fixed-offset /
  * US-Pacific representations of the same instants).
  *
  * The engine's canonical representation is UTC wall time under a
  * UTC-pinned session (testdata parquet reads as TIMESTAMP_NTZ). Spark's
  * typed timestamps carry no per-value zone, so only STRING columns can
  * actually arrive "tz-aware" in mixed representations:
  *
  *  - STRING → `to_timestamp` under the UTC session: naive strings are
  *    interpreted as UTC, explicit `+hh:mm` offsets and region zone ids
  *    (`America/Los_Angeles`) are honored — then rendered back to UTC wall
  *    time (NTZ) so downstream comparisons stay NTZ-vs-NTZ;
  *  - TIMESTAMP (instant) / TIMESTAMP_NTZ (UTC wall by convention) /
  *    DATE → already normalized, passed through.
  */
object Timestamps {
  def normalizeUtc(c: Column, dt: DataType): Column = dt match {
    case StringType => to_timestamp(c).cast(TimestampNTZType)
    case TimestampType | TimestampNTZType | DateType => c
    case other => throw new IllegalArgumentException(
      s"cannot normalize timestamp column of type $other")
  }
}
