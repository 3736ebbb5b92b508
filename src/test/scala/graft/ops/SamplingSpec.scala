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
}
