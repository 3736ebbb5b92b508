package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.model._
import graft.table.SnapshotTable

/** End-to-end CLI flow, mirroring the reference's local e2e test
  * (feast tests/e2e/test_e2e_local.py:14-22): init → apply → materialize →
  * retrieve, all through `Main.run`, validated against the direct API.
  */
class MainSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Long) = new Timestamp(1618185600000L + min * 60000L)

  test("apply -> feature-views list -> materialize -> incremental -> retrieve") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli").toString

    // source history: two days of driver rates
    (0 until 48).map { h =>
      (1L + h % 2, t(h * 60L), t(h * 60L), h.toDouble)
    }.toDF("driver_id", "event_timestamp", "created", "rate")
      .write.parquet(s"$dir/src.parquet")

    // the apply spec is itself a registry file (RegistryRow JSON lines)
    val spec = new Registry(spark, s"$dir/spec")
    spec.apply(Seq(FeatureView("driver_stats",
      Seq(Entity("driver", ValueType.INT64, Some("driver_id"))),
      Seq(Feature("rate", ValueType.DOUBLE)),
      BatchSource(s"$dir/src.parquet", "event_timestamp", Some("created")),
      ttlSeconds = Some(7L * 24 * 3600))))

    Main.run(spark, List("apply", s"$dir/registry", s"$dir/spec"))
    Main.run(spark, List("feature-views", "list", s"$dir/registry"))
    assert(new Registry(spark, s"$dir/registry").load().contains("driver_stats"))

    // materialize day 1, then incrementally through day 2
    Main.run(spark, List("materialize", s"$dir/registry", "driver_stats",
      "2021-04-12T00:00:00Z", "2021-04-13T00:00:00Z",
      s"$dir/table", s"$dir/ckpt.log"))
    val afterDay1 = SnapshotTable(s"$dir/table").read(spark)
      .collect().map(r => r.getLong(r.fieldIndex("driver_id")) ->
        r.getDouble(r.fieldIndex("rate"))).toMap
    // latest within day 1 (minutes 0..47 → hours 0..23 at minute h*60? rows
    // are at minute h*60 = hour h; day 1 covers h in [0, 24))
    assert(afterDay1 == Map(1L -> 22.0, 2L -> 23.0))

    Main.run(spark, List("materialize-incremental", s"$dir/registry", "driver_stats",
      "2021-04-14T00:00:00Z", s"$dir/table", s"$dir/ckpt.log"))
    val afterDay2 = SnapshotTable(s"$dir/table").read(spark)
    // snapshot table holds the latest commit = day-2 latest per key
    val latest = afterDay2.collect().map(r =>
      r.getLong(r.fieldIndex("driver_id")) -> r.getDouble(r.fieldIndex("rate"))).toMap
    assert(latest == Map(1L -> 46.0, 2L -> 47.0))
    // re-running incrementally is a checkpointed no-op (no new snapshot)
    val snapBefore = SnapshotTable(s"$dir/table").currentSnapshotId
    Main.run(spark, List("materialize-incremental", s"$dir/registry", "driver_stats",
      "2021-04-14T00:00:00Z", s"$dir/table", s"$dir/ckpt.log"))
    assert(SnapshotTable(s"$dir/table").currentSnapshotId == snapBefore)

    // the registry answers "what's materialized?" from the checkpoint log
    val intervals = new Registry(spark, s"$dir/registry")
      .materializedIntervals("driver_stats", Some(s"$dir/ckpt.log"))
    assert(intervals.size == 2)
    assert(intervals.head._1.toString == "2021-04-12T00:00:00Z")
    assert(intervals.last._2.toString == "2021-04-14T00:00:00Z")

    // retrieve: CLI output equals the direct API result
    Seq((100L, 1L, t(30 * 60L)), (101L, 2L, t(30 * 60L)))
      .toDF("order_id", "driver_id", "event_timestamp")
      .write.parquet(s"$dir/entity.parquet")
    Main.run(spark, List("retrieve", s"$dir/registry", s"$dir/entity.parquet",
      "driver_stats:rate", "event_timestamp", s"$dir/out"))
    val got = spark.read.parquet(s"$dir/out")
      .select("order_id", "rate").as[(Long, Double)].collect().toMap
    val direct = new Registry(spark, s"$dir/registry").featureStore()
      .getHistoricalFeatures(
        spark.read.parquet(s"$dir/entity.parquet"), Seq("driver_stats:rate"))
      .select("order_id", "rate").as[(Long, Double)].collect().toMap
    assert(got == direct)
    assert(got == Map(100L -> 30.0, 101L -> 29.0)) // hour-30 probe, inclusive <=
  }
}
