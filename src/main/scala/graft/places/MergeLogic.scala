package graft.places

import scala.collection.immutable.TreeMap
import graft.text.TextFunctions
import graft.text.TextFunctions.MatchType

/** The merge bot's per-group decision kernel, as a pure function over
  * JSON-ish place documents (Map[String, Any]). Runs inside
  * `mapGroups(merge_group)` in the distributed pipeline — groups are tiny
  * (a handful of places each), so exact greedy reference semantics stay
  * faithful while Spark parallelizes across groups.
  *
  * Reference: MergePlaceBot.java:359-482 (mergePlaces, addObjToOperation,
  * mergeFields), MergeUtil.java:209-229 (getMainOsmFromList).
  */
object MergeLogic {

  type Doc = Map[String, Any]

  private def asMap(v: Any): Map[String, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case _ => Map.empty
  }
  private def asList(v: Any): Seq[Any] = v match {
    case s: Seq[_] => s.asInstanceOf[Seq[Any]]
    case _ => Seq.empty
  }

  def id(doc: Doc): Seq[String] = asList(doc.getOrElse("id", Seq.empty)).map(String.valueOf)

  def osmSources(doc: Doc): Seq[Map[String, Any]] =
    asList(asMap(doc.getOrElse("source", Map.empty)).getOrElse("osm", Seq.empty)).map(asMap)

  /** getMainOsmFromList: first source with lat+lon+osm_value and no
    * `deleted`; if none, the first source that has `deleted`. */
  def mainOsm(doc: Doc): Option[Map[String, Any]] = {
    val sources = osmSources(doc)
    sources.find(o => !o.contains("deleted") && o.contains("lat") &&
        o.contains("lon") && o.contains("osm_value"))
      .orElse(sources.find(_.contains("deleted")))
  }

  def mainOsmTags(doc: Doc): Map[String, String] =
    mainOsm(doc).map(o => asMap(o.getOrElse("tags", Map.empty))
      .map { case (k, v) => k -> String.valueOf(v) }).orNull

  /** The merge decision: first MatchType (in the given order) under which
    * the old place's main-OSM tags match a candidate. Two candidates
    * matching → last one wins when the tier allows 2-place merges, else no
    * merge at all. Returns the matched candidate's index. */
  def mergeMatch(matchTypes: Seq[MatchType], oldDoc: Doc, candidates: Seq[Doc]): Option[Int] = {
    val oldTags = mainOsmTags(oldDoc)
    val candTags = candidates.map(mainOsmTags)
    def tagsOrEmpty(m: Map[String, String]): Map[String, String] =
      if (m == null) Map.empty else m
    matchTypes.foreach { mt =>
      var matched = -1
      candTags.zipWithIndex.foreach { case (ct, i) =>
        if (mt.matches(tagsOrEmpty(oldTags), tagsOrEmpty(ct))) {
          if (matched >= 0) {
            if (mt.allow2PlacesMerge) matched = i
            else return None
          } else matched = i
        }
      }
      if (matched >= 0) return Some(matched)
    }
    None
  }

  /** mergeFields for one list-of-lists field (`source`, `images`): new
    * categories are `set`; categories present on both sides `append` (one
    * element) or `appendmany`, recording the old list in `current`. */
  def mergeFieldChanges(field: String, oldDoc: Doc, newDoc: Doc)
      : (TreeMap[String, Any], TreeMap[String, Any]) = {
    var change = TreeMap.empty[String, Any]
    var current = TreeMap.empty[String, Any]
    val newFields = asMap(newDoc.getOrElse(field, null))
    val oldFields = asMap(oldDoc.getOrElse(field, null))
    newFields.foreach { case (key, v) =>
      val newList = asList(v)
      if (newList.nonEmpty) {
        val category = field + "." + key
        if (!oldFields.contains(key)) {
          change += category -> ChangeAlgebra.set(newList)
        } else {
          change += category -> (if (newList.size > 1)
            ChangeAlgebra.appendMany(newList) else ChangeAlgebra.append(newList.head))
          current += category -> oldFields(key)
        }
      }
    }
    (change, current)
  }

  final case class MergeOp(editedId: Seq[String], deletedId: Seq[String],
                           change: TreeMap[String, Any], current: TreeMap[String, Any])

  /** Full per-group greedy pass (the reference loops deleted places in
    * report order, consuming candidates). Returns the emitted merge ops. */
  def mergeGroup(matchTypes: Seq[MatchType], deletedPlaces: Seq[Doc],
                 activePlaces: Seq[Doc]): Seq[MergeOp] = {
    // the reference restricts tiers when a group holds several closed places
    val types = if (deletedPlaces.size > 1)
      matchTypes.filterNot(_ == TextFunctions.EmptyNameMatch) else matchTypes
    var remaining = activePlaces.toVector
    val ops = Seq.newBuilder[MergeOp]
    deletedPlaces.foreach { oldDoc =>
      mergeMatch(types, oldDoc, remaining).foreach { idx =>
        val newDoc = remaining(idx)
        remaining = remaining.patch(idx, Nil, 1)
        val (c1, cur1) = mergeFieldChanges("source", oldDoc, newDoc)
        val (c2, cur2) = mergeFieldChanges("images", oldDoc, newDoc)
        ops += MergeOp(id(oldDoc), id(newDoc), c1 ++ c2, cur1 ++ cur2)
      }
    }
    ops.result()
  }
}
