package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming counterparts of the batch feature ops. The reference
  * only *declares* stream sources (feast data_source.py:783-914 — Kafka and
  * Kinesis are registry metadata with no execution in the v0.11 snapshot);
  * here the batch semantics get a real streaming execution:
  * watermarked tumbling/sliding aggregates and gap sessionization via
  * `session_window`. Input is any streaming DataFrame with
  * (key, event_timestamp, value) — `readStream.format("kafka")` +
  * `from_avro`/`from_json` upstream of this module in production.
  */
object StreamFeatures {

  /** Watermarked tumbling counts/sums per key. Late data beyond
    * `watermarkDelay` is dropped (state is bounded — mandatory at scale).
    */
  def tumbling(
      stream: DataFrame,
      key: String,
      ts: String,
      width: String,
      watermarkDelay: String,
      valueCol: String): DataFrame =
    stream
      .withWatermark(ts, watermarkDelay)
      .groupBy(col(key), window(col(ts), width))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(
        col(key),
        unix_timestamp(col("window.start")).as("win_start"),
        col("n_events"), col("sum_value"))

  /** Sliding windows (width, slide). */
  def sliding(
      stream: DataFrame,
      key: String,
      ts: String,
      width: String,
      slide: String,
      watermarkDelay: String,
      valueCol: String): DataFrame =
    stream
      .withWatermark(ts, watermarkDelay)
      .groupBy(col(key), window(col(ts), width, slide))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(
        col(key),
        unix_timestamp(col("window.start")).as("win_start"),
        col("n_events"), col("sum_value"))

  /** Gap sessionization with `session_window` — the streaming equivalent of
    * [[graft.fe.Windows.sessionize]] (merging windows, watermark-bounded
    * state).
    */
  def sessionize(
      stream: DataFrame,
      key: String,
      ts: String,
      gap: String,
      watermarkDelay: String,
      valueCol: String): DataFrame =
    stream
      .withWatermark(ts, watermarkDelay)
      .groupBy(col(key), session_window(col(ts), gap))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(
        col(key),
        unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming latest-per-key materialization into an idempotent sink:
    * foreachBatch + batch latest-per-key, the streaming analogue of the
    * reference's online-store upsert (sqlite.py:76-128). Returned writer is
    * not started — callers pick trigger/checkpoint.
    */
  def latestToSink(
      stream: DataFrame,
      keys: Seq[String],
      ts: String,
      sinkPath: String,
      checkpoint: String) =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.materialize.Materialize
          .latestPerKey(batch, keys, ts)
          .write.mode("append").parquet(sinkPath)
      }
}
