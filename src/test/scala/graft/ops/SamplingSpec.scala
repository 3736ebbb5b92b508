package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic hash-keyed sampling/splitting: proportions, exhaustiveness,
  * repartition-stability (the property randomSplit does NOT have), and
  * mixture-rate semantics.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = spark.range(20000).select(col("id").as("doc_id"))

  test("hashSplit: exhaustive, disjoint, proportional, repartition-stable") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.hashSplit(ids, "doc_id", seed = 42L, splits)
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 20000) // every row assigned exactly once
    assert(math.abs(counts("train") - 16000) < 500, counts.toString)
    assert(math.abs(counts("val") - 2000) < 250, counts.toString)
    assert(math.abs(counts("test") - 2000) < 250, counts.toString)
    // assignment is a pure function of the id: repartitioning changes nothing
    val re = Sampling.hashSplit(ids.repartition(17), "doc_id", 42L, splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(re == base)
    // a different seed reshuffles the assignment
    val other = Sampling.hashSplit(ids, "doc_id", 43L, splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(other != base)
  }

  test("sampleByHash: rate-proportional subset of the full split") {
    val s10 = Sampling.sampleByHash(ids, "doc_id", 0.1, seed = 7L)
    val s30 = Sampling.sampleByHash(ids, "doc_id", 0.3, seed = 7L)
    val n10 = s10.count(); val n30 = s30.count()
    assert(math.abs(n10 - 2000) < 250, s"n10=$n10")
    assert(math.abs(n30 - 6000) < 450, s"n30=$n30")
    // nested: the 10% sample is a SUBSET of the 30% sample (same seed) —
    // growing a sample never resamples already-selected rows
    val ids10 = s10.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids30 = s30.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids10.subsetOf(ids30))
  }

  test("mixture: per-group rates honored; rate 1 keeps all, rate 0 drops all") {
    val df = ids.withColumn("grp",
      when(col("doc_id") % 3 === 0, "a").when(col("doc_id") % 3 === 1, "b").otherwise("c"))
    val out = Sampling.mixture(df, "doc_id", "grp",
      rates = Map("a" -> 1.0, "b" -> 0.2), seed = 11L, defaultRate = 0.0)
    val counts = out.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") == df.where(col("grp") === "a").count()) // all kept
    assert(math.abs(counts("b") - 0.2 * 6667) < 200, counts.toString)
    assert(!counts.contains("c")) // defaultRate 0 drops the group entirely
  }

  test("stratifiedExact: per-group counts are exactly ceil(n*rate); stable") {
    val df = ids.withColumn("grp",
      when(col("doc_id") % 4 === 0, "a").when(col("doc_id") % 4 === 1, "b").otherwise("c"))
    val groupN = df.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 333331 ppm — a rate that does NOT divide the group sizes evenly
    val out = Sampling.stratifiedExact(df, "grp", "doc_id", 333331L, seed = 5L)
    val counts = out.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    groupN.foreach { case (g, n) =>
      val k = (n * 333331L + 999999L) / 1000000L
      assert(counts(g) == k, s"group $g: got ${counts(g)}, want $k of $n")
    }
    // deterministic: the same call selects the identical id set
    val again = Sampling.stratifiedExact(df, "grp", "doc_id", 333331L, seed = 5L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("tokenBudget: kept prefix sums within budget; crossing doc dropped") {
    val df = ids.withColumn("grp", (col("doc_id") % 3).cast("string"))
      .withColumn("n_tok", col("doc_id") % 97 + 1)
    val out = Sampling.tokenBudget(df, "grp", "doc_id", "n_tok",
      budget = 1000L, seed = 3L).cache()
    val sums = out.groupBy("grp").agg(sum("n_tok").as("s"), max("cum_tokens").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sums.nonEmpty)
    sums.foreach { case (g, s, m) =>
      assert(s == m, s"group $g: cum_tokens must equal the kept sum")
      assert(s <= 1000L, s"group $g exceeds budget: $s")
    }
    // maximality: for each group, the next doc in priority order would cross
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("grp"))
      .orderBy(graft.functions.Mix61.mix61(col("doc_id"), lit(3L)).asc, col("doc_id").asc)
    val ranked = df.withColumn("cum", sum(col("n_tok")).over(w))
    val firstDropped = ranked.where(col("cum") > 1000L)
      .withColumn("rn", row_number().over(w.orderBy(col("cum").asc)))
      .where(col("rn") === 1)
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("cum")).toMap
    firstDropped.foreach { case (g, cum) =>
      assert(cum > 1000L, s"group $g: first dropped doc must cross the budget")
    }
    out.unpersist()
  }

  test("importanceWeights: matches the naive DSIR computation; separates target vocabulary") {
    import graft.functions.{Mix61, RollingHash}
    val data = Seq(
      (0L, "the cat sat on the mat", true),
      (1L, "the dog sat on the log", true),
      (2L, "cat and dog and mat", true),
      (3L, "xs qq zz ww vv", false),
      (4L, "qq ww ee rr tt yy", false),
      (5L, "the cat and the dog", false), // target-like vocab, raw slice
      (6L, "zz vv xs xs xs", false))
    val docs = data.toDF("doc_id", "text", "is_target")
    val B = 32
    val seed = 5L
    val got = Sampling.importanceWeights(docs, "doc_id", "text",
      col("is_target"), buckets = B, seed = seed)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // naive driver-side DSIR: hashed-unigram bucket counts, add-one smoothed
    // bag-of-words models, per-doc sum of log ratios
    def bucket(w: String): Int = (Mix61.mix(RollingHash.hash(w), seed) % B).toInt
    val perDoc: Map[Long, Map[Int, Long]] = data.map { case (id, text, _) =>
      id -> text.split("\\s+").filter(_.nonEmpty).map(bucket)
        .groupBy(identity).map { case (b, ws) => b -> ws.length.toLong }
    }.toMap
    def model(ids: Set[Long]): (Map[Int, Long], Long) = {
      val counts = perDoc.filter(kv => ids.contains(kv._1)).values
        .flatten.groupBy(_._1).map { case (b, cs) => b -> cs.map(_._2).sum }
      (counts, counts.values.sum)
    }
    val targetIds = data.filter(_._3).map(_._1).toSet
    val (tm, tn) = model(targetIds)
    val (rm, rn) = model(data.map(_._1).toSet)
    // micro-nat quantization (HALF_UP = ties away from zero, both engines)
    val llr: Map[Int, Long] = (0 until B).map { b =>
      val x = math.log((tm.getOrElse(b, 0L) + 1).toDouble / (tn + B)) -
        math.log((rm.getOrElse(b, 0L) + 1).toDouble / (rn + B))
      b -> BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.toMap
    val want = perDoc.map { case (id, counts) =>
      id -> counts.map { case (b, c) => c * llr(b) }.sum.toDouble / 1e6
    }
    assert(got.keySet == want.keySet)
    got.foreach { case (id, w) =>
      assert(w == want(id), s"doc $id: got $w want ${want(id)}")
    }
    // semantics: target-vocabulary docs (incl. the raw-slice doc 5 sharing
    // the target's words) outscore the junk-vocabulary docs
    val targetLike = Seq(0L, 1L, 2L, 5L).map(got)
    val junk = Seq(3L, 4L, 6L).map(got)
    assert(targetLike.min > junk.max,
      s"targetLike=$targetLike junk=$junk")
  }
}
