package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession

import graft.fe.Backfill
import graft.model.Registry
import graft.table.SnapshotTable

/** Command-line entry point mirroring the reference's CLI surface
  * (feast cli.py:1-299 driving repo_operations.py:1-368), re-expressed over
  * the JSON registry + parquet/snapshot-table infrastructure:
  *
  *   apply <registry> <specJson>          upsert feature-view definitions
  *                                        (spec = RegistryRow JSON lines —
  *                                        the registry file format itself)
  *   feature-views list <registry>        print applied views
  *   materialize <registry> <view> <startIso> <endIso> <table> <checkpoint>
  *                                        backfill latest-per-key snapshots
  *                                        over daily intervals, resumable
  *   materialize-incremental <registry> <view> <endIso> <table> <checkpoint>
  *                                        resume from the checkpoint log's
  *                                        last completed interval
  *   retrieve <registry> <entityParquet> <ref,ref,...> <entityTsCol> <out>
  *                                        point-in-time historical features
  *                                        (empty entityTsCol ⇒ inferred)
  *   get-online-features <registry> <keysParquet> <ref,ref,...> <asOfIso>
  *                                        point lookup of the latest values
  *                                        per key at asOf; prints one JSON
  *                                        row per key incl. per-feature
  *                                        statuses
  *   entities list <registry>             print distinct entities across views
  *   init <registry>                      create an empty registry
  *   teardown <registry>                  delete the registry and its
  *                                        interval logs
  *
  * Timestamps are ISO-8601 instants (e.g. 2024-01-10T00:00:00Z). The
  * SparkSession is created here only when none exists (spark-submit /
  * standalone use); under tests the active session is reused and left open.
  */
object Main {

  def main(args: Array[String]): Unit = {
    val existing = SparkSession.getDefaultSession.isDefined
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toList)
    finally if (!existing) spark.stop()
  }

  private def ts(iso: String): Timestamp = Timestamp.from(Instant.parse(iso))

  def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "apply" :: registryPath :: specJson :: Nil =>
      val spec = new Registry(spark, specJson)
      val views = spec.load().values.toSeq.sortBy(_.name)
      require(views.nonEmpty, s"no feature views found in $specJson")
      new Registry(spark, registryPath).apply(views)
      views.foreach(v => println(s"Applied feature view ${v.name}"))

    case "feature-views" :: "list" :: registryPath :: Nil =>
      val views = new Registry(spark, registryPath).load().values.toSeq.sortBy(_.name)
      if (views.isEmpty) println("No feature views")
      else views.foreach { v =>
        println(s"${v.name}  entities=${v.joinKeys.mkString(",")}  " +
          s"features=${v.features.map(_.name).mkString(",")}  " +
          s"ttl=${v.ttlSeconds.map(t => s"${t}s").getOrElse("none")}")
      }

    case "materialize" :: registryPath :: viewName :: start :: end :: table :: checkpoint :: Nil =>
      materialize(spark, registryPath, viewName, ts(start), ts(end), table, checkpoint)

    case "materialize-incremental" :: registryPath :: viewName :: end :: table :: checkpoint :: Nil =>
      val view = loadView(spark, registryPath, viewName)
      val start = Backfill.incrementalStart(checkpoint, ts(end), view.ttlSeconds)
      materialize(spark, registryPath, viewName, start, ts(end), table, checkpoint)

    case "retrieve" :: registryPath :: entityPath :: refs :: tsCol :: out :: Nil =>
      val store = new Registry(spark, registryPath).featureStore()
      val entity = spark.read.parquet(entityPath)
      val result = store.getHistoricalFeatures(
        entity, refs.split(",").map(_.trim).toSeq, entityTsColumn = tsCol)
      result.write.mode("overwrite").parquet(out)
      println(s"Wrote ${spark.read.parquet(out).count()} rows to $out")

    case "get-online-features" :: registryPath :: keysPath :: refs :: asOf :: Nil =>
      val store = new Registry(spark, registryPath).featureStore()
      val keys = spark.read.parquet(keysPath)
      val result = store.getOnlineFeatures(
        keys, refs.split(",").map(_.trim).toSeq, ts(asOf))
      // deterministic print order: sort by the key columns
      result.orderBy(keys.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
        .toJSON.collect().foreach(println)

    case "entities" :: "list" :: registryPath :: Nil =>
      val views = new Registry(spark, registryPath).load().values.toSeq
      val ents = views.flatMap(_.entities)
        .map(e => (e.name, graft.model.ValueType.name(e.valueType), e.key))
        .distinct.sortBy(_._1)
      if (ents.isEmpty) println("No entities")
      else ents.foreach { case (n, t, k) => println(s"$n  type=$t  join_key=$k") }

    case "init" :: registryPath :: Nil =>
      new Registry(spark, registryPath).apply(Nil)
      println(s"Created registry at $registryPath")

    // Interop: write the applied registry in the reference's protobuf wire
    // layout (Registry.proto) so a reference deployment can read it.
    case "export-registry" :: registryPath :: outPath :: rest if rest.size <= 1 =>
      graft.model.RegistryProto.exportTo(
        new Registry(spark, registryPath), outPath,
        project = rest.headOption.getOrElse("default"),
        lastUpdated = Instant.now())
      println(s"Exported registry to $outPath")

    case "teardown" :: registryPath :: Nil =>
      val root = java.nio.file.Paths.get(registryPath)
      // the registry is a directory of JSON part files; interval logs are
      // siblings named intervals_<view>.log — remove both, nothing else
      val logs = Option(root.toAbsolutePath.getParent).toSeq
        .flatMap { parent =>
          val d = parent.toFile.listFiles()
          if (d == null) Nil
          else d.toSeq.filter(f => f.getName.startsWith("intervals_") && f.getName.endsWith(".log"))
        }
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(); ()
      }
      logs.foreach(rm)
      if (root.toFile.exists()) rm(root.toFile)
      println(s"Removed registry at $registryPath")

    case other =>
      sys.error(
        "usage: apply|feature-views list|entities list|init|teardown|export-registry|" +
          "materialize|materialize-incremental|retrieve|get-online-features ..." +
          s" (got: ${other.mkString(" ")})")
  }

  private def loadView(spark: SparkSession, registryPath: String, name: String) =
    new Registry(spark, registryPath).load().getOrElse(name,
      throw new IllegalArgumentException(s"feature view '$name' not in registry"))

  private def materialize(
      spark: SparkSession,
      registryPath: String,
      viewName: String,
      start: Timestamp,
      end: Timestamp,
      table: String,
      checkpoint: String): Unit = {
    val view = loadView(spark, registryPath, viewName)
    val source = graft.model.FieldMapping(
      spark.read.parquet(view.source.path), view.source.fieldMapping)
    val metrics = Backfill.run(
      spark, source, view.joinKeys, view.source.eventTimestampColumn,
      view.source.createdTimestampColumn, start, end,
      stepSeconds = 24L * 3600, SnapshotTable(table), checkpoint)
    metrics.foreach(m => println(
      s"Materialized ${m.intervalId}: ${m.rows} rows, ${m.bytes} bytes, snapshot ${m.snapshotId}"))
    if (metrics.isEmpty) println("Nothing to materialize (all intervals checkpointed)")
  }
}
