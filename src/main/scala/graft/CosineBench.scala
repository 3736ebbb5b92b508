package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-volume scaling bench for embedding near-dup: demonstrates that
  * FIXED-bits sign-LSH bucketing grows candidate pairs quadratically with
  * corpus size ((N/2^bits)² per bucket) while corpus-scaled banded bucketing
  * (`targetBucketSize`) stays ~linear — the round-2 verdict's named
  * scale-killer (a). Candidate count is measured exactly by running the
  * operator at threshold = -1 (every candidate survives verification).
  *
  * Usage: runMain graft.CosineBench [n1] [n2]   (default 4000 16000)
  * Output: one JSON line; a 4× corpus must show ~16× candidates for fixed
  * bits vs ~4× for scaled — the growth exponents are printed directly.
  */
object CosineBench {
  def main(args: Array[String]): Unit = {
    val n1 = args.headOption.map(_.toInt).getOrElse(4000)
    val n2 = if (args.length > 1) args(1).toInt else n1 * 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic random embeddings, 32-dim, unit-free (cosine normalizes)
    def corpus(n: Int) = {
      val df = spark.range(n).map { id =>
        val rnd = new scala.util.Random(id * 2654435761L)
        (id, Array.fill(32)(rnd.nextGaussian().toFloat))
      }.toDF("vec_id", "embedding").cache()
      df.count()
      df
    }

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    val results = Seq(n1, n2).map { n =>
      val df = corpus(n)
      // fixed 4-bit bucketing — the round-2 shape
      val (tF, cF) = timed(graft.ops.Similarity.cosineNearDup(
        df, "vec_id", "embedding", numBits = 4, threshold = -1.0).count())
      // corpus-scaled: bits from targetBucketSize, 4 bands for recall
      val (tS, cS) = timed(graft.ops.Similarity.cosineNearDup(
        df, "vec_id", "embedding", numBits = 4, threshold = -1.0,
        bands = 4, targetBucketSize = 64L).count())
      df.unpersist()
      (n, tF, cF, tS, cS)
    }
    val Seq((_, tF1, cF1, tS1, cS1), (_, tF2, cF2, tS2, cS2)) = results
    def exp(b: Long, a: Long): Double =
      math.log(b.toDouble / a) / math.log(n2.toDouble / n1)
    println(
      s"""{"bench":"cosine_neardup_scaling","n1":$n1,"n2":$n2,""" +
        s""""fixed_cand_n1":$cF1,"fixed_cand_n2":$cF2,"fixed_growth_exp":${exp(cF2, cF1)},""" +
        s""""scaled_cand_n1":$cS1,"scaled_cand_n2":$cS2,"scaled_growth_exp":${exp(cS2, cS1)},""" +
        s""""fixed_sec_n1":$tF1,"fixed_sec_n2":$tF2,"scaled_sec_n1":$tS1,"scaled_sec_n2":$tS2}""")
    spark.stop()
  }
}
