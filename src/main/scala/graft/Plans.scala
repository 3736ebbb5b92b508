package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-quality evidence dump: formatted physical plans for the flagship
  * operators, written to PLANS.md. The points to verify by eye:
  *
  *  - feature scans show `PushedFilters` (time-range predicates reach
  *    parquet) and a pruned `ReadSchema` (no unrequested columns);
  *  - the windowed as-of join has exactly ONE exchange (hashpartitioning on
  *    the entity keys) feeding one in-partition sort — no join blow-up node;
  *  - aggregates show partial/final HashAggregate pairs (map-side combine);
  *  - scans/joins sit inside WholeStageCodegen spans.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val picks = Seq(
      "q01_pit_asof" -> "windowed as-of join: one exchange + one sort, no row explosion",
      "q03_pull_latest" -> "time-bounded latest: range filter pushed into the parquet scan",
      "q35_late_asof" -> "late-materialized as-of: narrow window + broadcast-semi payload fetch",
      "q05_tumbling" -> "tumbling agg: partial/final HashAggregate (map-side combine)",
      "q21_rolling" -> "range-frame rolling window",
      "q17_knn" -> "brute-force top-k: broadcast of the query side, codegen'd cosine",
      "q41_fs_tokens" -> "facade wide-payload routing: token arrays fetched AFTER the window (windowedLate), never sorted inside it",
      "q47_two_wide_views" -> "entity-side late materialization: TWO array views, each windowing a narrow (key, ts, rowid) probe — no array column in any WINDOW exchange/sort; each payload crosses one hash-join exchange, and the only array-bearing sort is the rowid dedup SortAggregate over the semi-PRUNED fetch set (the windowedLate duplicate guard)",
      "q39_ann_ivf" -> "IVF assignment as literal-centroid projection: no join, no window, no xN expansion before the probe equi-join",
      "q37_pack_sequences" -> "two-level packing: per-(lang, shard) cumsum windows + tiny offsets join",
      "q48_hash_split" -> "deterministic hash split: pure codegen'd projection, zero shuffles/exchanges",
      "q65_stratified" -> "exact stratified sample: ONE exchange on the stratum key — the rank window and the group-count window run in the same partitioning, then a codegen'd integral-div filter",
      "q66_token_budget" -> "token-budget fill: ONE exchange on the source key, running-sum window in that partitioning, codegen'd budget filter",
      "q67_composite_asof" -> "composite-key as-of: same single-exchange windowed shape as q01 with a two-column hash key — no extra shuffle for the wider key",
      "q50_components" -> "near-dup clustering: below the size gate the collected union-find result is a LocalTableScan (broadcasts into downstream joins); above it the large-star/small-star contraction runs (O(log^2 n) rounds regardless of diameter, BENCH/DEDUP.md) — forced-path specs assert star = hash-min = union-find",
      "q60_dup_spans" -> "duplicated-span dedup: span_hashes computed in the codegen'd scan projection (one native call per row, no higher-order lambdas), bounded posexplode to 8-byte longs, partial/final count agg, occurrences equi-joined to the small duplicated-hash side — corpus never self-joins",
      "q63_decontaminate_bloom" -> "Bloom-prefiltered decontamination: might_contain_61(bitmap) sits in the Filter directly above the corpus shingle Generate — rows failing the probe never reach the exact-verify join's exchange; output identical to q44",
      "q64_shuffle_batches" -> "deterministic shuffle + length batching: mix61 order key and bucket in the scan projection, per-(bucket, shard) ROW_NUMBER windows (buckets × shards concurrent tasks), tiny offsets frame joined back — no global sort",
      "q69_dsir_weights" -> "DSIR importance weights: the corpus text is scanned ONCE into a cached (doc, bucket) count frame (InMemoryTableScan everywhere downstream); BOTH bag-of-words models come from a single 64-row aggregation over it (conditional sum), the log-ratio table broadcasts back, and the final per-doc sum is integer arithmetic",
      "q79_semdedup_pairs" -> "SemDeDup: literal-centroid cell assignment in the scan projection, NARROW (id, cell) self-join on the cell key, vectors fetched only for surviving candidates, codegen'd cosine verify — embeddings never ride the candidate exchange",
      "q83_pipeline" -> "full curation pipeline (gopher filter -> exact dedup -> hash split -> token budget) composed as ONE plan: the quality filter and the split are scan-stage/codegen projections (no shuffle of their own), the dedup is one content-hash aggregate, the budget one per-source window — TWO shuffles end to end (the dedup aggregate and the window; the dedup-ids fetch is a broadcast join)")

    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of flagship operators\n\n")
    sb.append(s"Generated by `graft.Plans` against `$sfDir` (regenerate: " +
      "`runMain graft.Plans <sfDir> PLANS.md`). What to check per plan is " +
      "noted inline; see Plans.scala scaladoc for the global checklist.\n")
    picks.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name — $note\n\n```\n")
      // literal binary blobs (e.g. q63's Bloom bitmap) render as huge hex
      // strings — truncate them, the plan SHAPE is the evidence
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        .replaceAll("0x[0-9A-Fa-f]{64}[0-9A-Fa-f]+",
          "0x<binary literal truncated>")
        // q79's literal centroid vectors: keep the plan shape, not the floats
        .replaceAll("\\[[-0-9.,Ee]{120,}\\]", "[<float-array literal truncated>]")
      sb.append(plan)
      sb.append("```\n")
    }
    Files.write(Paths.get(out), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
