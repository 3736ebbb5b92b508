package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle-traffic evidence for digest-keyed exact dedup: the same
  * duplicate-heavy corpus through [[graft.ops.Dedup.exact]] (groups on the
  * raw text column — the exchange carries the corpus) and
  * [[graft.ops.Dedup.exactByDigest]] (groups on a 128-bit xxhash64 pair —
  * the exchange carries 24-byte rows), reporting wall time and total
  * shuffle-write bytes from task metrics. The bytes ratio is the point:
  * it is what turns a 100 TB dedup's exchange into a ~TB one, independent
  * of this VM's wall-clock noise. Output feeds BENCH/DEDUP.md.
  *
  * Usage: runMain graft.DigestBench [nDocs] [wordsPerDoc]   (default 200000 150)
  */
object DigestBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val wordsPerDoc = args.drop(1).headOption.map(_.toInt).getOrElse(150)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ~1 KB docs, 30% exact duplicates (every 10th..12th doc repeats doc i-7):
    // the shape where the text-keyed exchange pays full corpus width
    val rnd = new scala.util.Random(7)
    val vocab = Array.tabulate(30000)(i => s"tok$i")
    val texts = new Array[String](n)
    (0 until n).foreach { i =>
      texts(i) =
        if (i > 10 && i % 10 < 3) texts(i - 7)
        else (0 until wordsPerDoc).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toSeq.toDF("doc_id", "text")
      .repartition(32).cache()
    docs.count()
    val corpusBytes = docs.select(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.length($"text"))).head().getLong(0)

    val shuffleBytes = new AtomicLong()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffleBytes.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    def measured(f: => Long): (Double, Long, Long) = {
      Thread.sleep(1500) // drain listener events from previous jobs
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // let task-end events for this job arrive
      (sec, rows, shuffleBytes.get())
    }

    // warm BOTH plans' codegen/JIT on a slice (not measured) — warming only
    // one would bias its timed run
    graft.ops.Dedup.exact(docs.limit(1000), "text", "doc_id").count()
    graft.ops.Dedup.exactByDigest(docs.limit(1000), "text", "doc_id").count()

    val (tText, rText, bText) = measured(
      graft.ops.Dedup.exact(docs, "text", "doc_id").count())
    val (tDig, rDig, bDig) = measured(
      graft.ops.Dedup.exactByDigest(docs, "text", "doc_id").count())
    require(rText == rDig, s"representative counts differ: $rText vs $rDig")

    println(
      s"""{"bench":"digest_dedup","n_docs":$n,"corpus_bytes":$corpusBytes,""" +
      s""""distinct":$rDig,"text_sec":$tText,"text_shuffle_bytes":$bText,""" +
      s""""digest_sec":$tDig,"digest_shuffle_bytes":$bDig,""" +
      s""""shuffle_ratio":${bText.toDouble / math.max(1L, bDig)}}""")
    spark.stop()
  }
}
