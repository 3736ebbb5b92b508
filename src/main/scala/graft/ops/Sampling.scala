package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Mix61, RollingHash}

/** Deterministic sampling / splitting for training-data assembly, all keyed
  * by the engine-portable [[Mix61]] hash of a row id — NOT Spark's
  * `randomSplit`/`sample`, whose assignment depends on partitioning and RNG
  * draw order. Hash-keyed assignment gives the three properties a 100 TB
  * pipeline needs:
  *
  *  - reproducible across runs, cluster sizes, and engines (the DuckDB gate
  *    replays the identical buckets);
  *  - stable under repartitioning/backfill — a document keeps its split
  *    forever, so train/test contamination cannot creep in when data is
  *    re-ingested;
  *  - pure projection/filter — no shuffle, no state, fully codegen'd.
  *
  * Row ids must be LONG (for string ids, pre-hash with
  * `RollingHash.rolling_hash`). Buckets live on [0, 1e6): rates quantize to
  * one part per million.
  */
object Sampling {

  final val Buckets = 1000000L

  /** The portable bucket of a row: mix61(id, seed) mod 1e6. */
  def bucket(id: Column, seed: Long): Column =
    pmod(Mix61.mix61(id, lit(seed)), lit(Buckets))

  /** Train/val/test (or any n-way) split: appends a `split` column chosen by
    * the id's bucket against the cumulative weight boundaries. Weights are
    * normalized; every row is assigned (the last split absorbs rounding).
    */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      seed: Long,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "splits need positive weights")
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(c => math.round(c * Buckets)) // cumulative integer boundaries
    val b = bucket(col(idCol), seed)
    val assigned = splits.init.zip(bounds.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), acc) =>
      when(b < lit(hi), lit(name)).otherwise(acc)
    }
    df.withColumn("split", assigned)
  }

  /** Deterministic Bernoulli-by-hash sample at `rate` (quantized to 1e-6). */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double, seed: Long): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate in [0, 1]")
    df.where(bucket(col(idCol), seed) < lit(math.round(rate * Buckets)))
  }

  /** Quality-based selection: the top `k` rows per group by `orderCol`
    * descending, ties broken by ascending id (deterministic output). The
    * standard curation step "keep the k highest-quality documents per
    * source/language" — one window over a (group, score, id) projection;
    * combine with [[graft.ops.TextStats]] scores upstream. For very hot
    * groups at corpus scale, pre-aggregate with an approximate per-group
    * threshold first; at k ≪ group size the window's in-partition sort is
    * the cost, not a row explosion.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      idCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Mixture sampling: per-group keep rates (the source/language weights of
    * a training-data mixture, C4/Pile style). Groups absent from `rates`
    * take `defaultRate`. One codegen'd filter — the scan prunes whole groups
    * with rate 0 via the pushed predicate.
    */
  def mixture(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      rates: Map[String, Double],
      seed: Long,
      defaultRate: Double = 0.0): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 1),
      "rates in [0, 1]")
    val rateCol = rates.toSeq.sortBy(_._1).foldRight(lit(math.round(defaultRate * Buckets)): Column) {
      case ((g, r), acc) => when(col(groupCol) === lit(g), lit(math.round(r * Buckets))).otherwise(acc)
    }
    df.where(bucket(col(idCol), seed) < rateCol)
  }

  /** Exact stratified sample: EXACTLY ceil(n_g × rate) rows from every
    * group, chosen by ascending mix61(id) (ties by id) — the construction
    * for eval/holdout sets where per-stratum counts are contractual, unlike
    * [[mixture]]'s Bernoulli-by-hash whose per-group count is binomial.
    * Fully integer arithmetic (rate is parts-per-million), so the kept set
    * is bit-reproducible across engines.
    *
    * Shape: ONE shuffle on the group key; both windows (rank by hash,
    * group size) share the same partitioning. The per-group window sort is
    * the cost — at corpus scale a hot group sorts n_g rows, so for
    * approximate needs use [[mixture]] (a pure filter); exact-count
    * selection inherently needs a per-group order statistic.
    */
  def stratifiedExact(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      ratePerMillion: Long,
      seed: Long): DataFrame = {
    require(ratePerMillion >= 0 && ratePerMillion <= Buckets, "rate in [0, 1e6]")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(Mix61.mix61(col(idCol), lit(seed)).asc, col(idCol).asc)
    val wg = Window.partitionBy(col(groupCol))
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wg))
      // k = ceil(n * rate / 1e6) via integral `div` — exact past 2^53,
      // where a double-typed divide would silently round
      .where(col("__rn") <=
        expr(s"(__n * ${ratePerMillion}L + ${Buckets - 1}L) div ${Buckets}L"))
      .drop("__rn", "__n")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169): score
    * every document by how much more likely its hashed bag-of-words is under
    * a target corpus slice than under the raw corpus. Features are word
    * unigrams hashed into `buckets` via the portable mix61(rh61(word)), so
    * the DuckDB gate replays the identical buckets; both bag-of-words models
    * are add-one-smoothed bucket distributions, and
    * weight(doc) = Σ_b c_b(doc) · (ln p_target(b) − ln p_raw(b)).
    * Resample downstream by thresholding the weight or ranking with
    * [[topKPerGroup]] / [[sampleByHash]].
    *
    * Cross-engine float discipline: the per-bucket log-ratio is quantized
    * to INTEGER micro-nats before the per-doc sum (libm `ln` differs by
    * ulps between engines, and float summation order differs between
    * plans), so the aggregate is exact integer arithmetic and the final
    * weight — one correctly-rounded IEEE division — is bit-identical in
    * any engine. Stricter than the round-before-aggregate pattern of
    * [[TextStats.tfIdfTopTerms]]: a rounded SUM can still flip on the
    * rounding boundary; a summed INTEGER cannot.
    *
    * Shape at scale: the corpus text is scanned ONCE — explode → one
    * map-side-combinable shuffle to the compact (doc, bucket) count frame
    * (≤ `buckets` rows per doc), which is cached and feeds everything
    * downstream: BOTH bag-of-words models come out of a single
    * `buckets`-row aggregation over it (target counts via a conditional
    * sum, so no second corpus pass), totals are a 1-row aggregate of that,
    * the log-ratio table broadcasts back (no driver collect), and the
    * final per-doc sum re-shuffles the count frame on the doc id only.
    * Documents with no words have no bag-of-words and are absent from the
    * output, mirroring the reference method.
    */
  def importanceWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int,
      seed: Long): DataFrame = {
    require(buckets > 0, "buckets > 0")
    val words = df.select(
      col(idCol), isTarget.as("__t"),
      explode(filter(split(col(textCol), "\\s+"), w => length(w) > 0)).as("__w"))
    val perDoc = words
      .select(col(idCol), col("__t"),
        pmod(Mix61.mix61(RollingHash.rolling_hash(col("__w")), lit(seed)),
          lit(buckets.toLong)).as("__b"))
      .groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"), max(col("__t")).as("__t"))
      // eager localCheckpoint, not cache(): the frame feeds both the model
      // and the scoring, and its blocks are released when the frame is GC'd
      // instead of pinning storage for the session (TextStats.lmPerplexity
      // documents the same trade)
      .localCheckpoint()
    val models = perDoc.groupBy(col("__b")).agg(
      sum(when(col("__t"), col("__c")).otherwise(lit(0L))).as("__tc"),
      sum(col("__c")).as("__rc"))
    val totals = models.select(
      sum(col("__tc")).as("__tn"), sum(col("__rc")).as("__rn"))
    val spine = df.sparkSession.range(buckets).select(col("id").as("__b"))
    val logRatio = spine
      .join(models, Seq("__b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("__b"), round((
        log((coalesce(col("__tc"), lit(0L)) + 1).cast("double") /
          (col("__tn") + buckets)) -
        log((coalesce(col("__rc"), lit(0L)) + 1).cast("double") /
          (col("__rn") + buckets))) * 1e6, 0).cast("long").as("__llr"))
    perDoc
      .join(broadcast(logRatio), Seq("__b"))
      .groupBy(col(idCol))
      .agg((sum(col("__c") * col("__llr")).cast("double") / 1e6)
        .as("dsir_weight"))
  }

  /** Token-budget mixture fill: per group, keep documents in deterministic
    * mix61(id) priority order while the running token total stays within
    * `budget` — the "fill B tokens per source" step of training-mixture
    * assembly (a document is kept atomically; the one that would cross the
    * budget, and everything after it, is dropped). Emits `cum_tokens`, the
    * running total through the kept row, so downstream packing knows each
    * group's realized size.
    *
    * Shape: ONE shuffle on the group key, one running-sum window in that
    * partitioning, then a codegen'd filter. Same hot-group sort calculus as
    * [[stratifiedExact]].
    */
  def tokenBudget(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      tokensCol: String,
      budget: Long,
      seed: Long): DataFrame = {
    require(budget >= 0, "budget >= 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(Mix61.mix61(col(idCol), lit(seed)).asc, col(idCol).asc)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .where(col("cum_tokens") <= lit(budget))
  }
}
