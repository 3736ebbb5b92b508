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
