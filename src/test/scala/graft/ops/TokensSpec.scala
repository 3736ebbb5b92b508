package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Token-pipeline operators vs naive driver-side oracles: greedy packing
  * invariants (token conservation, order preservation, start-offset
  * bucketing), n-gram counts, truncate/pad shape.
  */
class TokensSpec extends SparkSpec {

  private def docs(seed: Long, n: Int, shards: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val len = rnd.nextInt(90) + 10
      val toks = Array.fill(len)(rnd.nextInt(1000))
      (i.toLong, s"s${i % shards}", toks, len)
    }.toDF("doc_id", "shard", "tokens", "n_tok")
  }

  test("packGreedy conserves every token in order and buckets by start offset") {
    val df = docs(7L, n = 120, shards = 3)
    val seqLen = 256
    val packed = Tokens.packGreedy(df, Seq("shard"), "doc_id", "tokens", "n_tok", seqLen)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getSeq[Int](4).toList)).toMap

    // naive oracle: per shard, docs in doc_id order, cut by running start
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getSeq[Int](2).toList, r.getInt(3)))
    val expected = rows.groupBy(_._2).flatMap { case (shard, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (_, _, toks, n) =>
        val pid = cum / seqLen
        cum += n
        (shard, pid, toks, n)
      }.groupBy { case (_, pid, _, _) => pid }.map { case (pid, group) =>
        (shard, pid) -> (group.size.toLong, group.map(_._4.toLong).sum,
          group.flatMap(_._3).toList)
      }
    }
    assert(packed == expected)
    // token conservation across all packs
    assert(packed.values.map(_._2).sum == rows.map(_._4.toLong).sum)
  }

  test("two-level packGreedy equals single-level over the (shard, order) layout") {
    import spark.implicits._
    val df = docs(19L, n = 150, shards = 2)
    val b = 8
    // two-level: shard = doc_id % b, offsets via per-shard prefix sums
    val two = Tokens.packGreedy(df, Seq("shard"), "doc_id", "tokens", "n_tok",
      seqLen = 256, subShards = b, shardExpr = Some(pmod(col("doc_id"), lit(b))))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getSeq[Int](4).toList)).toMap
    // oracle: single-level packing over a synthetic order key that encodes
    // the same (shard, doc_id) layout
    val relaid = df.withColumn("__ord2", pmod(col("doc_id"), lit(b)) * 1000000 + col("doc_id"))
    val one = Tokens.packGreedy(relaid, Seq("shard"), "__ord2", "tokens", "n_tok", 256)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getSeq[Int](4).toList)).toMap
    assert(two == one)
    // conservation: every token appears exactly once across packs
    val totalTokens = df.collect().map(_.getInt(3).toLong).sum
    assert(two.values.map(_._2).sum == totalTokens)
  }

  test("aligned two-level packGreedy: packs never cross shards, ids offset by padded spans") {
    import spark.implicits._
    val df = docs(23L, n = 130, shards = 2)
    val b = 4
    val seqLen = 256
    val out = Tokens.packGreedy(df, Seq("shard"), "doc_id", "tokens", "n_tok",
      seqLen, subShards = b, shardExpr = Some(pmod(col("doc_id"), lit(b))),
      alignShards = true)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getSeq[Int](4).toList)).toMap
    // naive oracle: per (shard key, sub-shard) pack independently; each
    // sub-shard's id range starts at (prefix sum of padded spans) / seqLen
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getSeq[Int](2).toList, r.getInt(3)))
    val expected = rows.groupBy(_._2).flatMap { case (key, ds) =>
      val byShard = ds.groupBy { case (id, _, _, _) => id % b }.toSeq.sortBy(_._1)
      var offset = 0L
      byShard.flatMap { case (_, sds) =>
        var cum = offset
        val packs = sds.sortBy(_._1).map { case (_, _, toks, n) =>
          val pid = cum / seqLen
          cum += n
          (pid, toks, n)
        }.groupBy(_._1).map { case (pid, g) =>
          (key, pid) -> (g.size.toLong, g.map(_._3.toLong).sum, g.flatMap(_._2).toList)
        }
        val tot = sds.map(_._4.toLong).sum
        offset += (tot + seqLen - 1) / seqLen * seqLen
        packs
      }
    }
    assert(out == expected)
    assert(out.values.map(_._2).sum == rows.map(_._4.toLong).sum)
  }

  test("packGreedy: zero-token docs are dropped; (keys, pack_id) stays unique in aligned mode") {
    import spark.implicits._
    // shard 0 (doc_id % 2 == 0) totals exactly seqLen=4 and ends with an
    // empty doc sitting ON the rounded boundary — previously that doc was
    // assigned the NEXT shard's first pack id, yielding two output rows
    // with the same (keys, pack_id)
    val df = Seq(
      (0L, "g", Seq(1, 2, 3, 4), 4), // shard 0, fills pack 0 exactly
      (2L, "g", Seq.empty[Int], 0),  // shard 0, zero tokens, on boundary
      (1L, "g", Seq(5, 6), 2),       // shard 1
      (3L, "g", Seq(7), 1)           // shard 1
    ).toDF("doc_id", "key", "tokens", "n_tok")
    val out = Tokens.packGreedy(df, Seq("key"), "doc_id", "tokens", "n_tok",
      seqLen = 4, subShards = 2, shardExpr = Some(pmod(col("doc_id"), lit(2))),
      alignShards = true).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getSeq[Int](4).toList))
    assert(out.map(_._1).distinct.length == out.length, "duplicate (keys, pack_id)")
    assert(out.toMap == Map(
      ("g", 0L) -> (1L, List(1, 2, 3, 4)),
      ("g", 1L) -> (2L, List(5, 6, 7))))
    intercept[IllegalArgumentException](Tokens.ngrams(df, "tokens", 0))
  }

  test("ngrams emit exactly len-n+1 grams per doc; counts match a naive scan") {
    val df = docs(11L, n = 40, shards = 2)
    val grams = Tokens.ngrams(df, "tokens", 3)
    val rows = df.collect().map(r => r.getSeq[Int](2).toList)
    assert(grams.count() == rows.map(t => math.max(0, t.size - 2)).sum)
    val got = grams.groupBy("gram").count()
      .collect().map(r => r.getSeq[Int](0).toList -> r.getLong(1)).toMap
    val naive = rows.flatMap(_.sliding(3).filter(_.size == 3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == naive)
  }

  test("multimodal frame sampling picks every stride-th frame index") {
    import spark.implicits._
    val df = Seq((1L, 10), (2L, 1)).toDF("id", "n_frames")
    val out = Multimodal.sampleFrameIndexes(df, "n_frames", stride = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2).toList).toMap
    assert(out(1L) == List(0, 4, 8))
    assert(out(2L) == List(0))
  }

  test("chunkWindows: strided overlapping windows; short tails dropped, ids stable") {
    import spark.implicits._
    val rnd = new scala.util.Random(23L)
    val docsL = (0 until 50).map(i =>
      (i.toLong, Array.fill(rnd.nextInt(100) + 1)(rnd.nextInt(1000))))
    val df = docsL.toDF("doc_id", "tokens")
    val (len, stride, minLen) = (16, 12, 5)
    val got = Tokens.chunkWindows(df, "doc_id", "tokens", len, stride, minLen)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getSeq[Int](3).toList)))
      .toMap
    // naive oracle: chunk c covers [c*stride, c*stride+len); chunk_id keeps
    // its pre-filter index so dropped tails leave gaps, not renumbering
    val expected = docsL.flatMap { case (id, t) =>
      val nStarts = (t.length + stride - 1) / stride
      (0 until nStarts).map { c =>
        val chunk = t.slice(c * stride, c * stride + len).toList
        (id, c) -> ((chunk.length.toLong, chunk))
      }.filter(_._2._2.size >= minLen)
    }.toMap
    assert(got == expected)
    // every token appears in at least one chunk when stride < len and the
    // doc itself is >= minLen (full coverage property of overlapping windows)
    docsL.filter(_._2.length >= len).foreach { case (id, t) =>
      val coveredN = got.collect { case ((i, c), _) if i == id => c }.toList
        .map(c => math.min(c * stride + len, t.length)).max
      assert(coveredN == t.length || t.length - coveredN < minLen)
    }
  }

  test("shuffleBatches: seed-stable permutation, homogeneous buckets, full batches") {
    import spark.implicits._
    val rnd = new scala.util.Random(41L)
    val docsL = (0 until 300).map(i => (i.toLong, rnd.nextInt(120) + 1))
    val df = docsL.toDF("doc_id", "n_tok")
    val (width, batch) = (16, 8)
    for (shards <- Seq(1, 4)) {
      val out = Tokens.shuffleBatches(df, "doc_id", "n_tok", width, batch, seed = 42L,
        subShards = shards)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
      assert(out.length == docsL.length) // no row lost or duplicated
      assert(out.map(_._1).toSet == docsL.map(_._1).toSet)
      val byDoc = docsL.toMap
      out.foreach { case (id, bucket, _, _) =>
        assert(bucket == (byDoc(id) - 1) / width) // bucket from length
      }
      // per bucket: positions form 0..n-1; every batch full except the last
      out.groupBy(_._2).foreach { case (_, rows) =>
        val pos = rows.map(r => r._3 * batch + r._4).sorted
        assert(pos.toList == (0L until rows.length.toLong).toList)
        val lastBatch = rows.map(_._3).max
        rows.groupBy(_._3).foreach { case (b, g) =>
          assert(g.length == batch || b == lastBatch)
        }
      }
    }
    // the shuffle is a real, seed-dependent permutation
    def order(seed: Long) = Tokens.shuffleBatches(df, "doc_id", "n_tok", width, batch, seed)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(0))).sorted.map(_._4).toList
    assert(order(42L) == order(42L))
    assert(order(42L) != order(43L))
  }

  test("truncatePad yields fixed width with pad token on the right") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2, 3)), (2L, Seq.range(0, 10))).toDF("id", "t")
    val out = df.select(col("id"), Tokens.truncatePad(col("t"), 5, -1).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(out(1L) == List(1, 2, 3, -1, -1))
    assert(out(2L) == List(0, 1, 2, 3, 4))
  }
}
