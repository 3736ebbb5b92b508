package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SpanHashes (O(doc) prefix-scan span fingerprints) must be bit-identical
  * to hashing every span's space-joined rendering with RollingHash — the
  * identity the DuckDB rh61 oracle replays.
  */
class SpanHashesSpec extends SparkSpec {
  import spark.implicits._

  private def naive(strs: Seq[String], n: Int): Seq[Long] =
    if (strs.length < n) Seq.empty
    else (0 to strs.length - n).map(i => RollingHash.hash(strs.slice(i, i + n).mkString(" ")))

  test("int/long arrays: every span equals RollingHash of the joined slice") {
    val rnd = new scala.util.Random(5L)
    val rows = (0 until 40).map { i =>
      val len = rnd.nextInt(60)
      // include negatives: the decimal rendering must match Spark's cast
      (i.toLong, Array.fill(len)(rnd.nextInt(2000) - 500))
    }
    for (n <- Seq(1, 3, 16)) {
      val got = rows.toDF("id", "toks")
        .select(col("id"), SpanHashes.span_hashes(col("toks"), n).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      rows.foreach { case (id, toks) =>
        assert(got(id) == naive(toks.map(_.toString), n).toList, s"n=$n id=$id")
      }
      val gotL = rows.map { case (id, t) => (id, t.map(_.toLong)) }.toDF("id", "toks")
        .select(col("id"), SpanHashes.span_hashes(col("toks"), n).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      assert(gotL == got) // long rendering == int rendering
    }
  }

  test("string arrays incl. multi-codepoint chars; short arrays are empty") {
    val rows = Seq(
      (1L, Seq("hello", "wörld", "日本", "😀ok")), // BMP + surrogate pair
      (2L, Seq("a")),
      (3L, Seq.empty[String]))
    val got = rows.toDF("id", "toks")
      .select(col("id"), SpanHashes.span_hashes(col("toks"), 2).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    rows.foreach { case (id, toks) =>
      assert(got(id) == naive(toks, 2).toList)
    }
    assert(got(2L).isEmpty && got(3L).isEmpty)
  }

  test("registered as a SQL function with a literal n") {
    graft.GraftExtensions.register(spark)
    Seq((1L, Seq(7, 8, 9))).toDF("id", "toks").createOrReplaceTempView("sh_t")
    val r = spark.sql("SELECT span_hashes(toks, 2) AS h FROM sh_t")
      .collect().head.getSeq[Long](0).toList
    assert(r == naive(Seq("7", "8", "9"), 2).toList)
  }
}
