package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native one-pass sign-LSH signature must be bit-identical to the
  * per-bit aggregate(zip_with(...)) formulation it replaced (the identity
  * the q24/q32 DuckDB oracles replay via mix61).
  */
class SignSignatureSpec extends SparkSpec {
  import spark.implicits._

  private def legacy(vec: org.apache.spark.sql.Column, numBits: Int, firstBit: Int) = {
    def planeSign(bit: Int, dim: org.apache.spark.sql.Column) = {
      val h = Mix61.mix61(dim.cast("long"), lit(101L + bit))
      when(h.bitwiseAND(1) === 1, lit(1.0)).otherwise(lit(-1.0))
    }
    (0 until numBits).map { b =>
      val dotExpr = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v.cast("double") * planeSign(firstBit + b, i)),
        lit(0.0), (acc, z) => acc + z)
      when(dotExpr > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce[org.apache.spark.sql.Column](_.bitwiseOR(_))
  }

  test("native signature equals the legacy per-bit formulation bit-for-bit") {
    val rnd = new scala.util.Random(17L)
    val rows = (0 until 200).map(i => (i.toLong, Array.fill(32)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "v")
    for ((bits, first) <- Seq((16, 0), (8, 16), (1, 3), (60, 0))) {
      val out = df.select(
        SignSignature.sign_signature(col("v"), bits, first).as("a"),
        legacy(col("v"), bits, first).as("b"))
        .collect()
      out.foreach(r => assert(r.getLong(0) == r.getLong(1), s"bits=$bits first=$first"))
    }
  }
}
