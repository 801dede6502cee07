package graft.places

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.text.TextFunctions
import graft.geo.GeoFunctions

/** The merge bot's report pipeline (§3.3): take an ordered history-report
  * feature list, form merge groups, and run the greedy per-group merge
  * kernel — group formation and classification are distributed DataFrame
  * code; the order-dependent kernel runs per group via mapGroups (groups
  * are a handful of co-located places, so per-group sequential logic is
  * exactly the reference semantics while groups parallelize freely).
  *
  * Reference: MergePlaceBot.mergeAndClosePlaces (MergePlaceBot.java:144-209),
  * MergeUtil.getMergeGroups (MergeUtil.java:99-113).
  */
object MergeReportJob {

  /** One history-report feature, pre-projected to what the merge decision
    * needs (MergePlaceBotOtherTest.java:52-82 builds exactly this). */
  case class ReportFeature(ord: Long, oprId: String, deleted: Option[String],
                           lat: Double, lon: Double, tags: Map[String, String])

  case class GroupResult(groupId: Long, closedPlaces: Int, similarPlaces: Int,
                         merged: Int, mergedPairs: Seq[(String, String)])

  val SimilarPlaceDistanceM = 100.0 // MergePlaceBot.java:40

  /** Greedy kernel for one group, replicating mergeAndClosePlaces' inner
    * loop: for each closed place in order, distance-filter the remaining
    * active places, pick the first matching tier (all tiers when the group
    * has one closed place, NAME..OTHER_NAME otherwise), last-wins inside a
    * tier, consume the merged candidate. */
  def processGroup(closed: Seq[ReportFeature], active: Seq[ReportFeature])
      : (Int, Int, Seq[(String, String)]) = {
    var remaining = active.toVector
    var similar = 0
    val merged = Seq.newBuilder[(String, String)]
    val types =
      if (closed.size == 1) TextFunctions.allMatchTypes
      else TextFunctions.allMatchTypes.filterNot(_ == TextFunctions.EmptyNameMatch)
    closed.foreach { c =>
      val near = remaining.filter(a =>
        GeoFunctions.haversineMScalar(c.lat, c.lon, a.lat, a.lon) <= SimilarPlaceDistanceM)
      if (near.nonEmpty) {
        similar += 1
        var matched = -1
        var tierIdx = 0
        var done = false
        while (!done && tierIdx < types.size) {
          val mt = types(tierIdx)
          var m = -1
          var i = 0
          var abort = false
          while (!abort && i < near.size) {
            if (mt.matches(c.tags, near(i).tags)) {
              if (m >= 0 && !mt.allow2PlacesMerge) { m = -1; abort = true; done = true }
              else m = i
            }
            i += 1
          }
          if (m >= 0) { matched = m; done = true }
          tierIdx += 1
        }
        if (matched >= 0) {
          val cand = near(matched)
          remaining = remaining.filterNot(_.ord == cand.ord)
          merged += ((c.oprId, cand.oprId))
        }
      }
    }
    (similar, merged.result().size, merged.result())
  }

  /** Assign merge-group ids over the ordered report: a new group starts
    * where a deleted feature follows a non-deleted one — except at the very
    * last position (the reference's loop stops at size-2). */
  def withGroupIds(features: Dataset[ReportFeature]): DataFrame = {
    val w = Window.orderBy("ord")
    features.toDF()
      .withColumn("is_del", col("deleted").isNotNull.cast("int"))
      .withColumn("prev_del", lag("is_del", 1, 0).over(w))
      .withColumn("max_ord", max("ord").over(Window.partitionBy()))
      .withColumn("boundary",
        (col("is_del") === 1 && col("prev_del") === 0 &&
          col("ord") =!= col("max_ord")).cast("int"))
      .withColumn("group_id", sum("boundary").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Run the full report merge: returns per-group results. */
  def run(spark: SparkSession, features: Seq[ReportFeature]): Dataset[GroupResult] = {
    import spark.implicits._
    run(features.toDS())
  }

  /** Distributed form: group-id window + per-group merge kernel, no
    * driver-side materialization of the feature list. */
  def run(features: Dataset[ReportFeature]): Dataset[GroupResult] = {
    val spark = features.sparkSession
    import spark.implicits._
    val grouped = withGroupIds(features)
    grouped.select(col("group_id"), col("ord"), col("oprId"), col("deleted"),
        col("lat"), col("lon"), col("tags"))
      .as[(Long, Long, String, Option[String], Double, Double, Map[String, String])]
      .groupByKey(_._1)
      .mapGroups { (gid, it) =>
        val fs = it.toSeq.sortBy(_._2).map { case (_, ord, id, del, lat, lon, tags) =>
          ReportFeature(ord, id, del, lat, lon, tags)
        }
        val (closed, active) = fs.partition(_.deleted.isDefined)
        val (similar, merged, pairs) = processGroup(closed, active)
        GroupResult(gid, closed.size, similar, merged, pairs)
      }
  }

  /** Parse a history-report GeoJSON (the June-2021 fixture format) into
    * report features, applying the regression test's preprocessing: group
    * by the deleted→created transition and reverse each group, so every
    * group reads [deleted..., created...]
    * (MergePlaceBotOtherTest.replacesFeature). */
  def parseReport(path: String): Seq[ReportFeature] = {
    val root = (if (path.endsWith(".gz")) {
      val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(path))
      try JsonDoc.parse(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    } else JsonDoc.parseFile(path)).asInstanceOf[Map[String, Any]]
    val geo = root("geo").asInstanceOf[Map[String, Any]]
    val features = geo("features").asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]])
    val raw = features.zipWithIndex.map { case (f, i) =>
      val props = f("properties").asInstanceOf[Map[String, Any]]
      ReportFeature(
        ord = i.toLong,
        oprId = String.valueOf(props.getOrElse("opr_id", "")),
        deleted = props.get("deleted").map(String.valueOf),
        lat = String.valueOf(props("lat")).toDouble,
        lon = String.valueOf(props("lon")).toDouble,
        tags = props.getOrElse("tags", Map.empty).asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> String.valueOf(v) })
    }
    // test preprocessing: split on created-after-deleted transitions
    // (skipping the last index) and reverse each chunk
    val n = raw.size
    val bounds = (1 until n - 1).filter(i => raw(i - 1).deleted.isDefined && raw(i).deleted.isEmpty)
    val starts = 0 +: bounds
    val ends = bounds :+ n
    starts.zip(ends).flatMap { case (s, e) => raw.slice(s, e).reverse }
      .zipWithIndex.map { case (f, i) => f.copy(ord = i.toLong) }
  }
}
