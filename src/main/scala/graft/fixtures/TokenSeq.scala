package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic generator for the north-rule input shape: an Iceberg-style
  * table of pre-tokenized training sequences
  * `(doc_id: string, tokens: array<int32>, n_tok: int32, source: string,
  *   event_timestamp, created_timestamp)`.
  *
  * Fully distributed generation: `spark.range(n)` + pure column expressions —
  * no driver-side data, no RNG objects (everything derives from xxhash64 of
  * the row index and a fixed seed), so the same (n, entities, seed) always
  * produces the same table on any cluster size. Anchor epoch 2021-04-12T00Z
  * echoes the reference's quickstart timestamps (driver_test_data.py:115-119).
  *
  * Skew: entity "doc_0" receives `hotShare` of all rows (hot-key salting
  * tests); everyone else is uniform. Controlled duplicate (doc_id, ts) pairs
  * differing only in created_timestamp exercise the tie-break.
  */
object TokenSeq {
  val AnchorEpoch: Long = 1618185600L // 2021-04-12T00:00:00Z

  def generate(
      spark: SparkSession,
      n: Long,
      entities: Int,
      seed: Long = 42L,
      maxTokens: Int = 512,
      hotSharePct: Int = 0,
      dupPct: Int = 10): DataFrame = {
    val base = spark.range(n)
    def h(salt: Int) = pmod(xxhash64(col("id"), lit(seed), lit(salt)), lit(Long.MaxValue))

    // entity assignment with optional hot key: hotSharePct% of rows → doc_0
    val uniform = h(1) % entities
    val ent = if (hotSharePct > 0) {
      when(h(0) % 100 < hotSharePct, lit(0)).otherwise(uniform)
    } else uniform

    // per-entity increasing grid: minute steps by row index within... at
    // generation scale we emit ts as a function of id so it's reproducible:
    // ts = anchor + (id / entities) minutes + jitter seconds; dupPct% of rows
    // reuse the previous slot's ts (same doc_id, ts — distinct created).
    val slot = (col("id") / entities).cast("long")
    val dupSlot = when(h(2) % 100 < dupPct, greatest(slot - 1, lit(0L))).otherwise(slot)
    val eventTs = timestamp_seconds(lit(AnchorEpoch) + dupSlot * 60L)
    val createdTs = timestamp_seconds(
      lit(AnchorEpoch) + dupSlot * 60L + (h(3) % 59L) + lit(1L))

    val nTok = (h(4) % maxTokens + 1).cast("int")
    val tokens = transform(
      sequence(lit(1), col("n_tok")),
      j => pmod(xxhash64(col("id"), j, lit(seed)), lit(50257L)).cast("int"))

    base
      .withColumn("seq_id", col("id")) // stable unique row key (late-materialization fetch key)
      .withColumn("doc_id", concat(lit("doc_"), ent.cast("string")))
      .withColumn("n_tok", nTok)
      .withColumn("tokens", tokens)
      .withColumn("source", element_at(
        array(lit("web"), lit("book"), lit("code"), lit("chat")),
        (h(5) % 4 + 1).cast("int")))
      .withColumn("event_timestamp", eventTs)
      .withColumn("created_timestamp", createdTs)
      // input_hint column order first; seq_id appended last
      .select("doc_id", "tokens", "n_tok", "source",
        "event_timestamp", "created_timestamp", "seq_id")
  }

  /** Entity frame for retrieval over a generated table: per entity, probe
    * timestamps on and off the feature grid (before-first → null-fill,
    * beyond-ttl → expiry, exact boundaries → inclusive-bound coverage).
    */
  def entityProbes(
      spark: SparkSession,
      entities: Int,
      probesPerEntity: Int,
      seed: Long = 42L,
      hotSharePct: Int = 0): DataFrame = {
    val uniform = col("id") % entities
    val ent =
      if (hotSharePct > 0)
        when(pmod(xxhash64(col("id"), lit(seed), lit(7)), lit(100)) < hotSharePct,
          lit(0L)).otherwise(uniform)
      else uniform
    spark.range(entities.toLong * probesPerEntity)
      .withColumn("doc_id", concat(lit("doc_"), ent.cast("string")))
      .withColumn(
        "event_timestamp",
        timestamp_seconds(
          lit(AnchorEpoch) - 3600L +
            pmod(xxhash64(col("id"), lit(seed), lit(99)), lit(7L * 24 * 3600))))
      .select(col("id").as("probe_id"), col("doc_id"), col("event_timestamp"))
  }
}
