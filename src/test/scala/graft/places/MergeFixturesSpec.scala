package graft.places

import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextFunctions

/** Replays the reference's merge-contract fixtures (10 pairs that MUST
  * merge, pairs that must NOT) against our merge kernel. Fixtures are read
  * from the read-only reference checkout at test time — they encode the
  * name-matching contract (MergePlaceBotTest.java:39-72).
  * Fixture layout: even index = active candidate, odd index = closed place. */
class MergeFixturesSpec extends AnyFunSuite {

  private val base = "/root/reference/openplacereviews-core/src/test/resources/merge"
  private def pairs(file: String): Seq[(Map[String, Any], Map[String, Any])] = {
    val docs = JsonDoc.docs(JsonDoc.parseFile(s"$base/$file"))
    docs.grouped(2).collect { case Seq(cand, closed) => (cand, closed) }.toSeq
  }

  test("all places.json pairs merge under the full tier set") {
    val ps = pairs("places.json")
    assert(ps.nonEmpty)
    ps.zipWithIndex.foreach { case ((candidate, closed), i) =>
      val m = MergeLogic.mergeMatch(TextFunctions.allMatchTypes, closed, Seq(candidate))
      assert(m.contains(0), s"pair $i must merge: " +
        s"${MergeLogic.mainOsmTags(closed)} vs ${MergeLogic.mainOsmTags(candidate)}")
    }
  }

  test("no places_not_merge.json pair merges by NAME_MATCH") {
    // NOTE: the reference's testNotMergeByName never exercised these
    // fixtures (it iterates `places`, not `placesNotMerge`, and its
    // assertFalse(x == null) asserts a merge happened). The fixture name
    // and content say: these names must not match. Some pairs DO merge
    // via OTHER_NAME_MATCH (shared old_name) — correctly so — hence the
    // tier restriction here.
    val ps = pairs("places_not_merge.json")
    assert(ps.nonEmpty)
    ps.zipWithIndex.foreach { case ((candidate, closed), i) =>
      val m = MergeLogic.mergeMatch(Seq(TextFunctions.NameMatch), closed, Seq(candidate))
      assert(m.isEmpty, s"pair $i must NOT merge by name: " +
        s"${MergeLogic.mainOsmTags(closed)} vs ${MergeLogic.mainOsmTags(candidate)}")
    }
  }

  test("mergeGroup emits set/append changes for source categories") {
    val (candidate, closed) = pairs("places.json").head
    val ops = MergeLogic.mergeGroup(TextFunctions.allMatchTypes, Seq(closed), Seq(candidate))
    assert(ops.size == 1)
    val op = ops.head
    assert(op.editedId == MergeLogic.id(closed))
    assert(op.deletedId == MergeLogic.id(candidate))
    assert(op.change.keys.exists(_.startsWith("source.")))
    // change verbs must be applicable to the closed doc
    val merged = ChangeAlgebra.applyChange(closed, op.change)
    assert(MergeLogic.osmSources(merged).size >
      MergeLogic.osmSources(closed).size - 1)
  }

  test("two closed places in one group drop the EMPTY_NAME tier") {
    val closedNoName = Map[String, Any]("id" -> Seq("t", "a"),
      "source" -> Map("osm" -> Seq(Map[String, Any](
        "lat" -> 1.0, "lon" -> 1.0, "osm_value" -> "cafe",
        "tags" -> Map[String, Any]()))))
    val closed2 = closedNoName + ("id" -> Seq("t", "b"))
    val cand = Map[String, Any]("id" -> Seq("t", "c"),
      "source" -> Map("osm" -> Seq(Map[String, Any](
        "lat" -> 1.0, "lon" -> 1.0, "osm_value" -> "cafe",
        "tags" -> Map[String, Any]("name" -> "Named")))))
    // single closed place: EMPTY_NAME tier applies (old name empty)
    assert(MergeLogic.mergeGroup(TextFunctions.allMatchTypes,
      Seq(closedNoName), Seq(cand)).size == 1)
    // two closed places: tier dropped, no match
    assert(MergeLogic.mergeGroup(TextFunctions.allMatchTypes,
      Seq(closedNoName, closed2), Seq(cand)).isEmpty)
  }
}
