package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Long-chain connected-components benchmark: large-star/small-star
  * ([[graft.ops.Dedup.starComponents]]) vs hash-min label propagation
  * ([[graft.ops.Dedup.hashMinComponents]]) on an adversarial chain-shaped
  * duplicate graph — `nChains` disjoint paths of `len` nodes, so the graph
  * diameter is len−1 regardless of edge count. Hash-min pays one
  * join round per hop of diameter; star contracts in O(log² n) rounds.
  * Near-dup graphs from pair mining are usually shallow cliques, but chain
  * shapes DO occur (A~B~C rewrite drift), and at 100 TB an
  * iteration-count blow-up is a wall-clock blow-up. Output feeds
  * BENCH/DEDUP.md ("Long-chain CC").
  *
  * Usage: runMain graft.CcBench [nChains] [len]   (default 100000 x 65)
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val nChains = args.headOption.map(_.toInt).getOrElse(100000)
    val len = args.drop(1).headOption.map(_.toInt).getOrElse(65)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // edge i of chain c: (c*len + pos, c*len + pos + 1), canonical a < b
    val e = spark.range(nChains.toLong * (len - 1)).select(
      (col("id") / (len - 1)).cast("long").as("c"),
      (col("id") % (len - 1)).as("p"))
      .select((col("c") * len + col("p")).as("a"),
        (col("c") * len + col("p") + 1).as("b"))
      .localCheckpoint()
    val nEdges = e.count()

    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(bit_xor(xxhash64(col("id"), col("comp"))).as("x"))
        .collect()(0).getLong(0)

    val sr = new java.util.concurrent.atomic.AtomicInteger
    val (starSec, starSum) = timed(checksum(
      graft.ops.Dedup.starComponents(e, maxIter = 25, rounds = sr)))
    val hr = new java.util.concurrent.atomic.AtomicInteger
    val (hmSec, hmSum) = timed(checksum(
      graft.ops.Dedup.hashMinComponents(e, maxIter = len + 5, rounds = hr)))
    require(starSum == hmSum, s"label checksums diverge: $starSum vs $hmSum")
    // the production route: hash-min head + star fallback (what
    // connectedComponents actually runs above the driver gate)
    val (escSec, escSum) = timed(checksum(graft.ops.Dedup.connectedComponents(
      e.select(col("a").as("id1"), col("b").as("id2")),
      maxIter = 25, driverMaxEdges = 0L)))
    require(escSum == starSum, s"escalation checksum diverges: $escSum vs $starSum")

    println(s"""{"metric":"cc_long_chain","n_chains":$nChains,"len":$len,""" +
      s""""n_edges":$nEdges,"diameter":${len - 1},""" +
      s""""star_sec":$starSec,"star_rounds":${sr.get},""" +
      s""""hashmin_sec":$hmSec,"hashmin_rounds":${hr.get},""" +
      s""""escalation_sec":$escSec,""" +
      s""""checksum":$starSum}""")
    spark.stop()
  }
}
