package graft.fe

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.materialize.Materialize
import graft.table.SnapshotTable

/** Resumable backfill materialization: walk an interval grid over a feature
  * history, materialize latest-per-key for each interval into a snapshot
  * table, and record a durable per-interval checkpoint + per-partition
  * lineage metrics. Re-running after a crash skips completed intervals —
  * the Spark re-expression of the reference's materialization_intervals
  * resume log (feast registry.py:208-246, feature_store.py:343-422
  * materialize_incremental).
  */
final case class IntervalMetrics(
    intervalId: String,
    rows: Long,
    bytes: Long,
    snapshotId: Long,
    partitions: Seq[(Int, Long)]) // (partitionId, rowCount) lineage

object Backfill {

  /** Checkpoint log: one JSON line per completed interval, append-only,
    * flushed per interval so a crash loses at most the in-flight interval.
    */
  final class CheckpointLog(path: String) {
    // toAbsolutePath: a bare relative filename has a null getParent
    Files.createDirectories(Paths.get(path).toAbsolutePath.getParent)
    def completed: Set[String] =
      if (!Files.exists(Paths.get(path))) Set.empty
      else Files.readAllLines(Paths.get(path)).asScala
        .flatMap(l => """"intervalId":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1)))
        .toSet
    def append(m: IntervalMetrics): Unit = {
      val parts = m.partitions.map { case (p, n) => s"""{"pid":$p,"rows":$n}""" }
        .mkString("[", ",", "]")
      val line =
        s"""{"intervalId":"${m.intervalId}","rows":${m.rows},"bytes":${m.bytes},""" +
          s""""snapshotId":${m.snapshotId},"partitions":$parts}""" + "\n"
      Files.write(Paths.get(path), line.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** Incremental-materialization start (feast feature_store.py:343-422
    * `materialize_incremental`): resume from the end of the most recent
    * completed interval in the checkpoint log; with no history, look back
    * `ttl` from `end` (unbounded ttl ⇒ epoch 0).
    */
  def incrementalStart(
      checkpointPath: String,
      end: Timestamp,
      ttlSeconds: Option[Long]): Timestamp = {
    val log = new CheckpointLog(checkpointPath)
    val lastEnd = log.completed
      .flatMap(_.split('_') match {
        case Array(_, hi) => scala.util.Try(java.time.Instant.parse(hi).toEpochMilli).toOption
        case _ => None
      })
    lastEnd.maxOption.map(new Timestamp(_)).getOrElse {
      ttlSeconds match {
        case Some(t) => new Timestamp(end.getTime - t * 1000L)
        case None => new Timestamp(0L)
      }
    }
  }

  /** Split [start, end) into aligned intervals of `stepSeconds`. */
  def grid(start: Timestamp, end: Timestamp, stepSeconds: Long): Seq[(Timestamp, Timestamp)] = {
    val s = start.getTime
    val e = end.getTime
    val step = stepSeconds * 1000L
    Iterator.iterate(s)(_ + step).takeWhile(_ < e)
      .map(lo => (new Timestamp(lo), new Timestamp(math.min(lo + step, e))))
      .toSeq
  }

  /** Run (or resume) the backfill. Returns metrics for intervals executed in
    * THIS run (skipped ones are absent). Per-partition row counts come from a
    * spark_partition_id() rollup on the materialized (already small) latest
    * frame — the lineage evidence the north rule asks for.
    */
  def run(
      spark: SparkSession,
      source: DataFrame,
      keys: Seq[String],
      ts: String,
      createdTs: Option[String],
      start: Timestamp,
      end: Timestamp,
      stepSeconds: Long,
      table: SnapshotTable,
      checkpointPath: String): Seq[IntervalMetrics] = {
    val log = new CheckpointLog(checkpointPath)
    val done = log.completed
    grid(start, end, stepSeconds).flatMap { case (lo, hi) =>
      val id = s"${lo.toInstant}_${hi.toInstant}"
      if (done.contains(id)) None
      // Crash healing: commit happened but the process died BEFORE the
      // checkpoint append — the table's current watermark already carries
      // this interval id. Re-committing would duplicate the snapshot; heal
      // by appending the missing log line from the committed snapshot.
      else if (table.currentSnapshot.exists(_.watermark.contains(id))) {
        val snap = table.currentSnapshot.get
        val m = IntervalMetrics(id, snap.totalRows, snap.totalBytes, snap.snapshotId, Nil)
        log.append(m)
        Some(m)
      } else {
        val latest = Materialize.pullLatest(source, keys, ts, createdTs, lo, hi)
          .withColumn("__interval", lit(id))
        val cached = latest.cache()
        try {
          val partCounts = cached
            .groupBy(spark_partition_id().as("pid")).count()
            .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq.sortBy(_._1)
          val snap = table.commit(cached.drop("__interval"), watermark = Some(id))
          val m = IntervalMetrics(id, snap.totalRows, snap.totalBytes, snap.snapshotId, partCounts)
          log.append(m)
          Some(m)
        } finally cached.unpersist()
      }
    }
  }
}
