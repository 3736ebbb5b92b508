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

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0

    // headline throughput: the BASELINE.md metric at bench scale
    val seqDir = "/tmp/graft_bench_seq"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$seqDir/sequences"))) {
      graft.fixtures.TokenSeq.generate(spark, 10000000L, 50000, maxTokens = 64,
          hotSharePct = ScalingBench.HotSharePct, dupPct = 10)
        .repartition(128).write.mode("overwrite").parquet(s"$seqDir/sequences")
      graft.fixtures.TokenSeq.entityProbes(spark, 50000, probesPerEntity = 40,
          hotSharePct = ScalingBench.HotSharePct)
        .repartition(32).write.mode("overwrite").parquet(s"$seqDir/probes")
    }
    val (nSeq, _, checksum, elapsed) = ScalingBench.timedJob(spark, seqDir)
    val rate = nSeq / elapsed

    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","pit_fe_sequences_per_sec":$rate,""" +
        s""""pit_fe_sequences":$nSeq,"pit_fe_elapsed_sec":$elapsed,""" +
        s""""pit_fe_checksum":$checksum,""" +
        s""""scaling_evidence":"BENCH/BASELINE.md"}""")
    spark.stop()
  }
}
