package graft.fe

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.SparkSpec
import graft.fixtures.TokenSeq
import graft.table.SnapshotTable

/** Resumable backfill + snapshot-table semantics: interval grid, crash/resume
  * (completed intervals are skipped on re-run), per-partition lineage metrics,
  * snapshot isolation and time travel — the Spark re-expression of the
  * reference's materialization_intervals resume log (registry.py:208-246,
  * feature_store.py:343-422).
  */
class BackfillSpec extends SparkSpec {

  private def t(sec: Long): Timestamp = new Timestamp((TokenSeq.AnchorEpoch + sec) * 1000L)

  private def freshDir(name: String): String = {
    val d = Files.createTempDirectory(name)
    d.toString
  }

  test("grid splits [start, end) into aligned intervals, last one clamped") {
    val g = Backfill.grid(t(0), t(3600 * 5 + 100), 3600)
    assert(g.size == 6)
    assert(g.head == (t(0), t(3600)))
    assert(g.last == (t(3600 * 5), t(3600 * 5 + 100)))
  }

  test("backfill materializes latest-per-key per interval with lineage metrics") {
    val root = freshDir("snap")
    val ckpt = s"${freshDir("ckpt")}/log.jsonl"
    val src = TokenSeq.generate(spark, n = 9000, entities = 30)
    val table = SnapshotTable(root)

    val metrics = Backfill.run(spark, src, Seq("doc_id"), "event_timestamp",
      Some("created_timestamp"), t(0), t(4 * 3600), 3600, table, ckpt)

    assert(metrics.size == 4)
    assert(metrics.forall(_.rows > 0))
    assert(metrics.forall(_.bytes > 0))
    assert(metrics.forall(_.partitions.nonEmpty), "per-partition lineage missing")
    // per-partition counts roll up to the interval row count
    metrics.foreach(m => assert(m.partitions.map(_._2).sum == m.rows))
    // snapshots chain: 4 commits, history newest-first
    val hist = table.history
    assert(hist.size == 4)
    assert(hist.map(_.snapshotId) == Seq(4L, 3L, 2L, 1L))
    assert(hist.head.parentId.contains(3L))
  }

  test("resume skips completed intervals and completes the remainder") {
    val root = freshDir("snap2")
    val ckpt = s"${freshDir("ckpt2")}/log.jsonl"
    val src = TokenSeq.generate(spark, n = 9000, entities = 30)
    val table = SnapshotTable(root)

    // first run: only the first 2 intervals (simulated partial run / crash)
    val first = Backfill.run(spark, src, Seq("doc_id"), "event_timestamp",
      Some("created_timestamp"), t(0), t(2 * 3600), 3600, table, ckpt)
    assert(first.size == 2)

    // resume over the FULL range: the 2 done intervals are skipped
    val resumed = Backfill.run(spark, src, Seq("doc_id"), "event_timestamp",
      Some("created_timestamp"), t(0), t(4 * 3600), 3600, table, ckpt)
    assert(resumed.size == 2, "resume must only execute the missing intervals")
    assert(resumed.map(_.intervalId).toSet.intersect(first.map(_.intervalId).toSet).isEmpty)

    // idempotent: a third run over the same range executes nothing
    val third = Backfill.run(spark, src, Seq("doc_id"), "event_timestamp",
      Some("created_timestamp"), t(0), t(4 * 3600), 3600, table, ckpt)
    assert(third.isEmpty)
    assert(table.history.size == 4)
  }

  test("crash between commit and checkpoint append heals without a duplicate snapshot") {
    val root = freshDir("snap3")
    val ckpt = s"${freshDir("ckpt3")}/log.jsonl"
    val src = TokenSeq.generate(spark, n = 3000, entities = 10)
    val table = SnapshotTable(root)

    // simulate the torn state: interval 1 committed to the table (its id is
    // the current watermark) but the process died BEFORE log.append
    val id = s"${t(0).toInstant}_${t(3600).toInstant}"
    table.commit(
      graft.materialize.Materialize.pullLatest(
        src, Seq("doc_id"), "event_timestamp", Some("created_timestamp"), t(0), t(3600)),
      watermark = Some(id))
    assert(table.history.size == 1)

    // the resume must NOT re-commit interval 1 — it heals the log from the
    // committed snapshot and only executes interval 2
    val resumed = Backfill.run(spark, src, Seq("doc_id"), "event_timestamp",
      Some("created_timestamp"), t(0), t(2 * 3600), 3600, table, ckpt)
    assert(resumed.map(_.intervalId) == Seq(id, s"${t(3600).toInstant}_${t(2 * 3600).toInstant}"))
    assert(table.history.size == 2, "torn interval was re-committed as a duplicate snapshot")
    // and the healed log makes the next run fully idempotent
    assert(Backfill.run(spark, src, Seq("doc_id"), "event_timestamp",
      Some("created_timestamp"), t(0), t(2 * 3600), 3600, table, ckpt).isEmpty)
  }

  test("a crash BEFORE publish leaves an orphan data dir; the retry commit clears it") {
    import graft.materialize.Materialize
    val root = freshDir("snap4")
    val table = SnapshotTable(root)
    val src = TokenSeq.generate(spark, n = 1000, entities = 5)
    // simulate a writer that died mid-parquet-write: data/000000001/ exists
    // with a partial file but no manifest was ever published
    val orphan = Paths.get(root, "data", "000000001")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-00000.snappy.parquet"), Array[Byte](1, 2, 3))
    // without orphan clearing this dies forever on mode("errorifexists")
    val snap = table.commit(
      Materialize.pullLatest(src, Seq("doc_id"), "event_timestamp",
        Some("created_timestamp"), t(0), t(3600)))
    assert(snap.snapshotId == 1L && table.read(spark).count() > 0)
  }

  test("manifest watermark with JSON-escaped characters round-trips exactly") {
    val root = freshDir("snap5")
    val table = SnapshotTable(root)
    val wm = "a\"b\\c\nd\te" // quote, backslash, newline, tab
    import spark.implicits._
    table.commit(Seq((1L, 1.0)).toDF("k", "v"), watermark = Some(wm))
    assert(table.currentSnapshot.get.watermark.contains(wm))
  }

  test("snapshot table: time travel reads exactly the as-of snapshot's rows") {
    val root = freshDir("snap3")
    val table = SnapshotTable(root)
    import spark.implicits._
    val s1 = table.commit(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val s2 = table.commit(Seq((3, "c")).toDF("id", "v"))
    assert(table.currentSnapshotId.contains(s2.snapshotId))
    assert(table.read(spark, asOf = Some(s1.snapshotId)).count() == 2)
    assert(table.read(spark).count() == 1)
    // manifest stats come from parquet footers, no scan
    assert(s1.totalRows == 2 && s2.totalRows == 1)
    assert(s1.totalBytes > 0)
  }

  test("reader ignores files not in the manifest (crash-safe isolation)") {
    val root = freshDir("snap4")
    val table = SnapshotTable(root)
    import spark.implicits._
    table.commit(Seq((1, "a")).toDF("id", "v"))
    // simulate a crashed writer: orphan parquet in a data dir with no manifest
    Seq((99, "zz")).toDF("id", "v").write
      .parquet(Paths.get(root, "data", "000000099").toString)
    assert(table.read(spark).count() == 1, "orphan files must be invisible")
  }

  test("compact rewrites many small files into few; expire drops old data") {
    val root = freshDir("snap5")
    val table = SnapshotTable(root)
    import spark.implicits._
    // a fragmented commit: 8 tiny files
    val s1 = table.commit((1 to 80).map(i => (i, s"v$i")).toDF("id", "v"), numFiles = 8)
    assert(s1.files.size == 8)
    val rows = table.read(spark).collect().map(_.toString).sorted.toSeq
    val s2 = table.compact(spark, targetBytes = Long.MaxValue) // -> 1 file
    assert(s2.files.size == 1)
    assert(table.read(spark).collect().map(_.toString).sorted.toSeq == rows)
    assert(table.read(spark, asOf = Some(s1.snapshotId)).count() == 80) // still travelable
    // retention: keep only the compacted snapshot
    val expired = table.expireSnapshots(keepLast = 1)
    assert(expired == Seq(s1.snapshotId))
    assert(table.read(spark).collect().map(_.toString).sorted.toSeq == rows)
    // expired id now FAILS (never silently reads current)
    intercept[IllegalStateException] {
      table.read(spark, asOf = Some(s1.snapshotId))
    }
    // the expired snapshot's immutable data dir is physically gone
    assert(!Files.exists(Paths.get(root, "data", f"${s1.snapshotId}%09d")))
    assert(table.history.map(_.snapshotId) == Seq(s2.snapshotId))
  }
}
