package graft.exec

import graft.SparkSpec
import graft.fixtures.TokenSeq

/** Hot-key detection against the skewed/uniform TokenSeq fixtures. */
class SkewSpec extends SparkSpec {

  test("detects the planted hot key and nothing else on skewed data") {
    val skewed = TokenSeq.generate(spark, n = 20000, entities = 50, hotSharePct = 30)
    val hot = Skew.detectHotKeys(skewed, "doc_id", hotShare = 0.1, sampleFraction = 0.2)
    assert(hot == Seq("doc_0"), s"got $hot")
  }

  test("uniform data yields no hot keys at a 10% threshold") {
    val uniform = TokenSeq.generate(spark, n = 20000, entities = 50, hotSharePct = 0)
    val hot = Skew.detectHotKeys(uniform, "doc_id", hotShare = 0.1, sampleFraction = 0.2)
    assert(hot.isEmpty, s"got $hot")
  }
}
