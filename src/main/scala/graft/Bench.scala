package graft

import org.apache.spark.sql.SparkSession

/** Per-round bench contract: ONE JSON line on stdout with per-query wall
  * times over SPARK_GRAFT_SF_DIR, plus the headline BASELINE.md metric —
  * end-to-end PIT + windowed-FE throughput (sequences/sec) over the
  * tokenized-sequence input (10M rows, generated once to /tmp and reused
  * across rounds). Scaling efficiency across parallelism levels is measured
  * separately by tools/scaling_bench.sh → BENCH/BASELINE.md (fresh JVM per
  * level; can't be done inside one JVM).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_ONLY=q13,q14,q40 — iterate on a subset (skips the
    // headline), run IN THE GIVEN ORDER; overlapping prefixes are
    // deduplicated by query name (first mention wins) so no query is timed
    // twice or emitted as a duplicate JSON key
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSeq)
    val selected: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      only match {
        case Some(prefixes) =>
          prefixes.flatMap(p => SparkEntry.queries.toSeq.filter(_._1.startsWith(p)).sortBy(_._1))
            .distinctBy(_._1)
        case None => SparkEntry.queries.toSeq.sortBy(_._1) // deterministic order
      }

    // Dedicated UNREPORTED warmup (bench protocol, see README): exercise the
    // parquet scan → shuffle → window/join codegen machinery once so q01's
    // reported time is warm work, not JIT + classloading. Round 2 instead let
    // q01 "absorb warmup", which made the flagship PIT number unreadable
    // round-over-round (6.2 s vs 0.33 s) — the warmup must not be a reported
    // query's timing.
    {
      import org.apache.spark.sql.functions.{col, row_number}
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      ev.withColumn("__rn", row_number().over(w))
        .join(ev.select(col("event_id")), Seq("event_id"))
        .groupBy(col("event_type")).count().count()
    }

    // failures are RECORDED, not swallowed — a broken query must not show
    // up as a normal-looking timing in BENCH_r{N}.json
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(200))
      }
      name -> ((System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val errs = results.collect { case (k, (_, Some(e))) => s"\"$k\":${jstr(e)}" }
      .mkString("{", ",", "}")
    val nFailed = results.count(_._2._2.isDefined)
    val total = if (results.nonEmpty) results.map(_._2._1).sum else 0.0

    if (only.isDefined) { // subset run: per-query times only, then exit
      println(s"""{"metric":"subset","value":$total,"unit":"sec","queries":$qs,"failed":$nFailed,"errors":$errs,"sf":"$sfDir"}""")
      spark.stop()
      return
    }

    // headline throughput: the BASELINE.md metric at bench scale. Fixture is
    // generated once to /tmp and reused — guarded by a params marker so a
    // partial prior run or a stale pre-fixture-change dir regenerates.
    val seqDir = "/tmp/graft_bench_seq"
    val params = s"v2 rows=10000000 entities=50000 maxTokens=64 " +
      s"hot=${ScalingBench.HotSharePct} dup=10 probesPerEntity=40"
    val markerPath = java.nio.file.Paths.get(s"$seqDir/PARAMS")
    val cacheOk =
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"$seqDir/sequences")) &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"$seqDir/probes")) &&
      java.nio.file.Files.exists(markerPath) &&
      java.nio.file.Files.readString(markerPath) == params
    if (!cacheOk) {
      graft.fixtures.TokenSeq.generate(spark, 10000000L, 50000, maxTokens = 64,
          hotSharePct = ScalingBench.HotSharePct, dupPct = 10)
        .repartition(128).write.mode("overwrite").parquet(s"$seqDir/sequences")
      graft.fixtures.TokenSeq.entityProbes(spark, 50000, probesPerEntity = 40,
          hotSharePct = ScalingBench.HotSharePct)
        .repartition(32).write.mode("overwrite").parquet(s"$seqDir/probes")
      java.nio.file.Files.writeString(markerPath, params)
    }
    val (nSeq, _, checksum, elapsed) = ScalingBench.timedJob(spark, seqDir)
    val rate = nSeq / elapsed

    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failed":$nFailed,"errors":$errs,""" +
        s""""sf":"$sfDir","pit_fe_sequences_per_sec":$rate,""" +
        s""""pit_fe_sequences":$nSeq,"pit_fe_elapsed_sec":$elapsed,""" +
        s""""pit_fe_checksum":$checksum,""" +
        s""""scaling_evidence":"BENCH/BASELINE.md"}""")
    spark.stop()
  }
}
