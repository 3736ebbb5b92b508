package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._
import graft.pit.{AsOfJoin, AsOfSpec}
import graft.materialize.Materialize

/** Facade re-creating the reference's `FeatureStore.get_historical_features`
  * (feast feature_store.py:276-341) as one declarative Catalyst plan:
  * resolve refs → per-view (scan → field-map → prune to entity time range →
  * as-of join) → fold left-joins onto the entity frame. Spark is the
  * execution engine, so the "RetrievalJob" IR is simply the returned lazy
  * DataFrame.
  */
final class FeatureStore(spark: SparkSession, views: Map[String, FeatureView]) {

  def getHistoricalFeatures(
      entityDf: DataFrame,
      featureRefs: Seq[String],
      entityTsColumn: String = "event_timestamp",
      fullFeatureNames: Boolean = false): DataFrame = {
    require(entityDf.columns.contains(entityTsColumn),
      s"entity frame is missing timestamp column '$entityTsColumn'")
    val grouped = FeatureRefs.group(FeatureRefs.parse(featureRefs), views, fullFeatureNames)
    val bounds = Materialize.timestampBounds(entityDf, entityTsColumn)

    grouped.toSeq.sortBy(_._1.name).foldLeft(entityDf) { case (acc, (view, feats)) =>
      val keys = view.joinKeys
      keys.foreach(k => require(acc.columns.contains(k),
        s"entity frame is missing join key '$k' for view '${view.name}'"))
      val raw = spark.read.parquet(view.source.path)
      val mapped = FieldMapping(raw, view.source.fieldMapping)
      val pruned = Materialize.pruneToEntityRange(
        mapped, view.source.eventTimestampColumn, bounds, view.ttlSeconds)
      val projected = pruned.select(
        (keys ++ Seq(view.source.eventTimestampColumn) ++
          view.source.createdTimestampColumn.toSeq ++ feats).distinct.map(col): _*)
      val spec = AsOfSpec(
        keys = keys,
        leftTs = entityTsColumn,
        rightTs = view.source.eventTimestampColumn,
        createdTs = view.source.createdTimestampColumn,
        ttlSeconds = view.ttlSeconds,
        features = feats)
      val joined = AsOfJoin.windowed(acc, projected, spec)
      feats.foldLeft(joined) { (d, f) =>
        d.withColumnRenamed(f, FeatureRefs.outputName(view.name, f, fullFeatureNames))
      }
    }
  }
}
