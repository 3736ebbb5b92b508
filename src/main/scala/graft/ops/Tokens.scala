package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-sequence operators for large-scale training-data assembly, over the
  * engine's native payload shape (`tokens: array<int>`). All declarative
  * column/window plans — one shuffle each, no UDFs, token arrays never
  * sorted by a window (they ride only through the final grouped
  * aggregation).
  */
object Tokens {

  /** Greedy contiguous sequence packing: within each key group (shard),
    * documents are laid out in `orderCol` order and cut into packs of
    * `seqLen` tokens by their running start offset — the standard
    * pack-to-context-length step of an LLM pretraining pipeline, expressed
    * as cumsum window + hash aggregation:
    *
    *   pack_id = floor((cumsum(n_tok) - n_tok) / seqLen)
    *
    * A document goes to the pack where it STARTS (documents are not split;
    * packs can overflow by up to one document — the usual greedy variant).
    * Output: one row per (keys, pack_id) with the flattened token array,
    * document count, and token count. Deterministic: per-pack order is
    * re-established with sort_array over (order, tokens) structs, so the
    * result is independent of partitioning.
    */
  def packGreedy(
      df: DataFrame,
      keys: Seq[String],
      orderCol: String,
      tokensCol: String,
      nTokCol: String,
      seqLen: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumStart = (sum(col(nTokCol)).over(w) - col(nTokCol)).as("__cum_start")
    df.select((keys.map(col) :+ col(orderCol) :+ col(tokensCol).as("__t") :+
        col(nTokCol).as("__n") :+ cumStart): _*)
      .withColumn("pack_id", floor(col("__cum_start") / seqLen).cast("long"))
      .groupBy((keys.map(col) :+ col("pack_id")): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n")).cast("long").as("n_tok"),
        flatten(transform(
          sort_array(collect_list(struct(col(orderCol).as("o"), col("__t").as("t")))),
          x => x.getField("t"))).as("packed"))
  }

  /** Token n-grams, one output row per occurrence: (gram: array<int>) —
    * feed to groupBy().count() for corpus statistics. The slide/explode is
    * bounded by the token count, so row growth is exactly ×(len-n+1).
    */
  def ngrams(df: DataFrame, tokensCol: String, n: Int): DataFrame =
    df.where(size(col(tokensCol)) >= n)
      .select(explode(transform(
        sequence(lit(1), size(col(tokensCol)) - (n - 1)),
        i => slice(col(tokensCol), i, lit(n)))).as("gram"))

  /** Truncate to `len` tokens and right-pad with `padToken` — the fixed-
    * width tensorization step. Pure column expression.
    */
  def truncatePad(tokens: Column, len: Int, padToken: Int): Column = {
    val cut = slice(tokens, 1, len)
    // array_repeat, not sequence: sequence(1, 0) DESCENDS in Spark
    concat(cut, array_repeat(lit(padToken), greatest(lit(0), lit(len) - size(cut))))
  }
}
