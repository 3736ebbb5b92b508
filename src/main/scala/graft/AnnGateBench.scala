package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Crossover benchmark for the IVF/PQ literal-projection gate
  * ([[graft.ops.Similarity.defaultMaxLiteralCentroids]]): times `pqEncode`
  * (the purest per-row k-argmin — m×k l2sq evaluations per row) through
  * BOTH paths at growing codebook sizes on one synthetic corpus. The
  * literal path inlines k centroid vectors into one generated method; the
  * kernel path ships them once per executor as a task broadcast and loops.
  * Both compute identical FP ops (SimilarityGateSpec proves byte-equal
  * codes); this measures where the expression tree stops being the right
  * carrier. Output feeds BENCH/ANN.md.
  *
  * Usage: runMain graft.AnnGateBench [nVectors]   (default 100000)
  */
object AnnGateBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val dim = 32
    val m = 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic hash-derived vectors (no RNG state, same corpus at any
    // parallelism)
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    val corpus = spark.range(n.toLong).mapPartitions { it =>
      it.map { r =>
        val id = r
        val v = Array.tabulate(dim) { j =>
          val h = (id * 1315423911L + j * 2654435761L) * -7046029254386353131L
          ((h >>> 40).toInt % 1000) / 500f - 1f
        }
        Row(id, v.toSeq)
      }
    }(Encoders.row(schema)).cache()
    corpus.count()

    def timed(f: => Long): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    // JVM/codegen warm
    graft.ops.Similarity.pqEncode(corpus, "vec_id", "embedding",
      graft.ops.Similarity.pqCodebooks(corpus, "vec_id", "embedding", m, 8)).count()

    val results = scala.collection.mutable.ArrayBuffer.empty[String]
    for (k <- Seq(16, 64, 256, 1024)) {
      val books = graft.ops.Similarity.pqCodebooks(corpus, "vec_id", "embedding", m, k)
      val lit =
        if (k <= 1024) Some(timed(graft.ops.Similarity.pqEncode(
          corpus, "vec_id", "embedding", books, maxLiteralCentroids = k).count()))
        else None
      val ker = timed(graft.ops.Similarity.pqEncode(
        corpus, "vec_id", "embedding", books, maxLiteralCentroids = 1).count())
      results += s"""{"k":$k,"literal_sec":${lit.map(_.toString).getOrElse("null")},"kernel_sec":$ker}"""
      System.err.println(s"[anngate] k=$k literal=${lit.getOrElse(Double.NaN)} kernel=$ker")
    }
    // scalar JSON line for the log
    println(s"""{"metric":"ann_gate_crossover","n":$n,"dim":$dim,"m":$m,"points":[${results.mkString(",")}]}""")
    spark.stop()
  }
}
