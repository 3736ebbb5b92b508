package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stop-shingle-regime dedup benchmark: measures the three exact-Jaccard
  * strategies on a synthetic boilerplate-heavy corpus (every doc shares a
  * 22-word header — the regime where a full inverted-index join explodes as
  * Σ df² while prefix filtering and the df cap stay linear-ish).
  *
  * Rationale for a dedicated fixture: the sf documents table has no frequent
  * shingles, so there the 3-stage plain plan wins on fixed per-stage costs
  * (codegen + scheduling dominate at 10⁵ shingles). This bench isolates the
  * data-dependent term the 100 TB posture cares about. Output feeds
  * BENCH/BASELINE.md.
  *
  * Usage: runMain graft.DedupBench [nDocs]   (default 10000)
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val header = "terms of service all rights reserved this document is " +
      "provided as is without warranty of any kind either express or implied"
    val rnd = new scala.util.Random(42)
    val words = Array.tabulate(5000)(i => s"w$i")
    val docs = (0 until n).map { i =>
      val tail = (0 until 15).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      (i.toLong, s"$header $tail")
    }.toDF("doc_id", "text").cache()
    docs.count() // materialize
    graft.ops.Dedup.exact(docs, "text", "doc_id").count() // JVM/codegen warm

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val t = 0.85
    val (tPrefix, rPrefix) = timed(
      graft.ops.Dedup.ngramJaccardPrefix(docs, "doc_id", "text", 3, t).count())
    val (tCapped, rCapped) = timed(
      graft.ops.Dedup.ngramJaccard(docs, "doc_id", "text", 3, t, Some(100L)).count())
    // the uncapped Σ df² join is the job-killer under measurement — it can
    // exhaust the driver heap outright at n=10000, which is itself the result
    val plainOutcome =
      try {
        val (s, r) = timed(
          graft.ops.Dedup.ngramJaccard(docs, "doc_id", "text", 3, t).count())
        s""""plain_sec":$s,"plain_rows":$r,"plain_over_prefix":${s / tPrefix}"""
      } catch {
        case e: Throwable =>
          s""""plain_sec":-1,"plain_error":"${e.toString.takeWhile(_ != '\n').take(120)}""""
      }

    println(
      s"""{"bench":"dedup_stop_shingle","n_docs":$n,"threshold":$t,""" +
        s""""prefix_sec":$tPrefix,"capped_sec":$tCapped,""" +
        s""""prefix_rows":$rPrefix,"capped_rows":$rCapped,$plainOutcome}""")
    spark.stop()
  }
}
