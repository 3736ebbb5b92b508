package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Null/empty-text contract of the corpus operators: the fixtures carry no
  * nulls, so the DuckDB gate cannot witness this — a real crawl can. The
  * contract under test: a null or empty text never crashes an operator;
  * rows with nothing to compute on are DROPPED from derived outputs (no
  * bag-of-words → absent, mirroring the reference methods) or scored from
  * the empty token list where a score is total (stats).
  */
class NullRobustnessSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, null.asInstanceOf[String]),
    (3L, ""),
    (4L, "   "),
    (5L, "the quick brown fox jumps over the lazy dog")) // dup of 1
    .toDF("doc_id", "text")

  test("exact dedup: null/empty/blank texts are distinct keys, no crash") {
    val kept = Dedup.exact(corpus, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 1 and 5 collapse; null, "", "   " each survive (distinct contents)
    assert(kept == Set(1L, 2L, 3L, 4L))
  }

  test("shingles/minhash/spans: nothing to hash -> row absent, no crash") {
    val sh = Dedup.wordShingles(corpus, "doc_id", "text", 3)
    val withShingles = sh.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(withShingles == Set(1L, 5L))
    assert(Dedup.minhashLsh(corpus, "doc_id", "text", shingleN = 3,
      numHashes = 8, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 5L)))
    val toks = corpus.select(col("doc_id"),
      filter(split(col("text"), "\\s+"), w => length(w) > 0).as("toks"))
    assert(Dedup.duplicatedSpans(toks, "doc_id", "toks", n = 3)
      .count() >= 0) // null token arrays filtered, no NPE
  }

  test("empty/whitespace-only text scores 0, never 1.0-unique or phantom-repetitive") {
    // split("") yields [""] (size 1) — a size===0 guard is dead, so an
    // empty doc used to score uniqueWordRatio = 1.0 and pass unique_ok
    val scored = corpus.select(col("doc_id"),
      TextStats.uniqueWordRatio(col("text")).as("u"),
      TextStats.meanWordLen(col("text")).as("m"),
      TextStats.stopwordRatio(col("text")).as("s"),
      TextStats.repetitionRatio(col("text"), 2).as("r"))
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2), r.get(3), r.get(4))).toMap
    assert(scored(3L) == ((0.0, 0.0, 0.0, 0.0)))
    assert(scored(4L) == ((0.0, 0.0, 0.0, 0.0)))
    // repetition is whitespace-insensitive: same text padded scores the same
    val pair = Seq((1L, "x y x y"), (2L, "  x y x y  "))
      .toDF("doc_id", "text")
      .select(TextStats.repetitionRatio(col("text"), 2).as("r"))
      .collect().map(_.getDouble(0)).toSeq
    assert(pair.head == pair(1))
  }

  test("multimodal: zero-frame videos sample no frames; null payloads score empty") {
    val frames = Multimodal.sampleFrameIndexes(
      Seq((1L, 9), (2L, 0)).toDF("vid", "n_frames"), "n_frames", stride = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2).toList).toMap
    assert(frames(1L) == List(0, 4, 8))
    assert(frames(2L) == Nil) // sequence(0,-1) would have emitted [0]
    val feats = Multimodal.extractFeatures(
      Seq(Multimodal.Asset(7L, "audio", null, 0, 0, 16000, 0)).toDS())
      .collect().head
    assert(feats.n_bytes == 0L && feats.feature.isEmpty)
  }

  test("document stats / lang-id / gopher: nulls score as empty, no crash") {
    val stats = TextStats.documentStats(corpus, "doc_id", "text")
    assert(stats.count() == 5) // stats are total: every row scored
    val lm = TextStats.lmPerplexity(corpus, "doc_id", "text",
      isRef = col("doc_id") === 1L, buckets = 16, seed = 3L)
      .collect().map(_.getLong(0)).toSet
    assert(lm == Set(1L, 5L)) // no bigram -> absent
  }

  test("token-weighted sampling ops ignore null-text rows, no crash") {
    val w = Sampling.importanceWeights(corpus, "doc_id", "text",
      isTarget = col("doc_id") === 1L, buckets = 16, seed = 3L)
      .collect().map(_.getLong(0)).toSet
    assert(w == Set(1L, 5L)) // no bag-of-words -> absent
  }
}
