package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-document duplicated-span benchmark: the regime that decides 100 TB
  * viability for exact-substring dedup. Synthetic corpus of `nDocs`
  * documents × `docLen` tokens, each embedding one shared 200-token
  * boilerplate block (the duplicated text) at a deterministic offset among
  * otherwise-unique tokens.
  *
  * Contrasts the [[graft.functions.SpanHashes]] prefix-scan kernel
  * (O(docLen) per row, whole-stage codegen) with the naive higher-order
  * formulation (`transform(sequence, i -> rolling_hash(array_join(slice(
  * cast-to-string array)))`) — CodegenFallback, re-evaluating the
  * loop-invariant string array per span, O(spans × docLen) interpreted.
  * Both produce bit-identical span ids; only the cost model differs, and
  * the gap grows linearly with document length. Also times the
  * [[graft.ops.Dedup.maskDuplicatedSpans]] apply step (dense-coverage
  * masking through the MaskCovered merge scan). Output feeds
  * BENCH/DEDUP.md.
  *
  * Usage: runMain graft.SpanBench [nDocs] [docLen] [n]  (default 2000 512 50)
  */
object SpanBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(2000)
    val docLen = if (args.length > 1) args(1).toInt else 512
    val n = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val boiler = Array.tabulate(200)(i => 1000000 + i)
    val rnd = new scala.util.Random(42)
    val docs = (0 until nDocs).map { i =>
      val uniq = Array.fill(docLen - boiler.length)(rnd.nextInt(1 << 20))
      val at = (i * 37) % (docLen - boiler.length)
      val toks = uniq.take(at) ++ boiler ++ uniq.drop(at)
      (i.toLong, toks)
    }.toDF("doc_id", "tokens").localCheckpoint() // isolate generator cost
    graft.ops.Dedup.exact(
      docs.select(col("doc_id"), col("tokens").cast("string").as("t")),
      "t", "doc_id").count() // JVM/codegen warm

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    val (tKernel, rKernel) = timed(
      graft.ops.Dedup.duplicatedSpans(docs, "doc_id", "tokens", n).count())
    val (tMask, rMask) = timed(
      graft.ops.Dedup.maskDuplicatedSpans(docs, "doc_id", "tokens", n)
        .select(sum(col("n_masked"))).collect().head.getLong(0))

    // naive higher-order formulation (the pre-kernel implementation), same
    // downstream plan — bit-identical span ids, O(spans × docLen) eval
    val strToks = transform(col("tokens"), t => t.cast("string"))
    val naiveHashes = transform(
      sequence(lit(1), size(col("tokens")) - (n - 1)),
      i => graft.functions.RollingHash.rolling_hash(
        array_join(slice(strToks, i, lit(n)), " ")))
    val naiveSpans = docs.where(size(col("tokens")) >= n)
      .select(col("doc_id"), posexplode(naiveHashes))
      .select(col("doc_id"), col("pos"), col("col").as("span_h"))
    val naiveDup = naiveSpans.groupBy(col("span_h"))
      .agg(count(lit(1)).as("n_occ")).where(col("n_occ") >= 2)
    val (tNaive, rNaive) = timed(naiveSpans.join(naiveDup, Seq("span_h")).count())

    println(
      s"""{"bench":"span_dedup_long_docs","n_docs":$nDocs,"doc_len":$docLen,"span_n":$n,""" +
        s""""kernel_sec":$tKernel,"kernel_rows":$rKernel,""" +
        s""""mask_sec":$tMask,"masked_tokens":$rMask,""" +
        s""""naive_sec":$tNaive,"naive_rows":$rNaive,""" +
        s""""naive_over_kernel":${tNaive / tKernel}}""")
    spark.stop()
  }
}
