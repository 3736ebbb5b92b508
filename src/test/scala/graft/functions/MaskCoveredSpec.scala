package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaskCoveredSpec extends SparkSpec {
  import spark.implicits._

  private def run(toks: Seq[Int], pos: Seq[Int]): List[Int] =
    Seq((toks, pos)).toDF("t", "p")
      .select(MaskCovered.mask_covered(col("t"), col("p"), -1).as("m"))
      .collect().head.getSeq[Int](0).toList

  test("merge-scan masking: sparse, dense, empty, duplicate positions") {
    assert(run(Seq(10, 20, 30, 40), Seq(2, 4)) == List(10, -1, 30, -1))
    assert(run(Seq(10, 20, 30), Seq(1, 2, 3)) == List(-1, -1, -1)) // fully covered
    assert(run(Seq(10, 20, 30), Seq.empty) == List(10, 20, 30))
    assert(run(Seq(10, 20), Seq(1, 1, 2, 2)) == List(-1, -1)) // dup positions tolerated
    assert(run(Seq.empty, Seq.empty) == Nil)
    // positions beyond the array are ignored
    assert(run(Seq(10, 20), Seq(2, 5)) == List(10, -1))
  }
}
