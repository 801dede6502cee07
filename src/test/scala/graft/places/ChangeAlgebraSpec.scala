package graft.places

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import scala.collection.immutable.TreeMap

class ChangeAlgebraSpec extends AnyFunSuite {
  import ChangeAlgebra._

  test("generateDiff matches the reference golden case (incl. unicode and escaped URL keys)") {
    // reference: PlaceOpObjectHelperTest.java:14-32
    val oldM = Map[String, Any](
      "addr:city" -> "台北市", "amenity" -> "cafe", "http://touat.com.tw" -> "running")
    val newM = Map[String, Any](
      "addr:city" -> "rets", "amenity" -> "bar", "http://touat.com.tw1" -> "test")
    val (change, current) = generateDiff("tags.", oldM, newM)
    assert(current == TreeMap[String, Any](
      "tags.addr:city" -> "台北市",
      "tags.amenity" -> "cafe",
      "tags.{http://touat.com.tw}" -> "running"))
    assert(change == TreeMap[String, Any](
      "tags.addr:city" -> Map("set" -> "rets"),
      "tags.amenity" -> Map("set" -> "bar"),
      "tags.{http://touat.com.tw1}" -> Map("set" -> "test"),
      "tags.{http://touat.com.tw}" -> "delete"))
  }

  test("parsePath handles dots, indices, and escaped keys") {
    assert(parsePath("source.osm[1].deleted") ==
      List(Field("source"), Field("osm"), Index(1), Field("deleted")))
    assert(parsePath("tags.{http://x.com/a}") ==
      List(Field("tags"), Field("http://x.com/a")))
    assert(parsePath("{a\\[0\\].b}") == List(Field("a[0].b")))
    assert(parsePath(addQuotes("weird.key[3]")) == List(Field("weird.key[3]")))
  }

  test("applyChange verbs: set / delete / append / appendmany at nested paths") {
    val doc = Map[String, Any](
      "source" -> Map("osm" -> Seq(
        Map[String, Any]("id" -> 1L, "tags" -> Map("name" -> "Cafe A")),
        Map[String, Any]("id" -> 2L))))
    val r1 = applyChange(doc, Map("source.osm[0].deleted" -> set("2021-07-01")))
    assert(MergeLogic.osmSources(r1).head("deleted") == "2021-07-01")
    val r2 = applyChange(doc, Map("source.osm[1]" -> "delete"))
    assert(MergeLogic.osmSources(r2).size == 1)
    val r3 = applyChange(doc,
      Map("source.osm" -> append(Map[String, Any]("id" -> 3L))))
    assert(MergeLogic.osmSources(r3).size == 3)
    val r4 = applyChange(doc,
      Map("source.osm" -> appendMany(Seq(Map[String, Any]("id" -> 3L), Map[String, Any]("id" -> 4L)))))
    assert(MergeLogic.osmSources(r4).map(_("id")) == Seq(1L, 2L, 3L, 4L))
    val r5 = applyChange(doc, Map("tags.{http://a.b}" -> set("v")))
    assert(r5("tags").asInstanceOf[Map[String, Any]]("http://a.b") == "v")
  }

  private val keyGen = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8)),
    Gen.oneOf("addr:city", "name:en", "http://site.com/x", "a.b", "k[2]"))
  private val valGen: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)), Gen.choose(-1000L, 1000L), Gen.oneOf(true, false))
  private val mapGen: Gen[Map[String, Any]] =
    Gen.mapOf(Gen.zip(keyGen, valGen)).map(_.take(8))

  test("property: applyChange(diff(a,b), a) == b for flat maps under a prefix") {
    val pairs = Gen.zip(mapGen, mapGen)
    (0 until 200).foreach { i =>
      val (a, b) = pairs.pureApply(Gen.Parameters.default, Seed(42L + i))
      val (change, _) = generateDiff("tags.", a, b)
      val result = applyChange(Map("tags" -> a), change)
      assert(result.getOrElse("tags", Map.empty) == b, s"a=$a b=$b")
    }
  }

  test("order dependence: edits fold in sequence (append after set)") {
    val out = applyAll(Map.empty,
      Seq(Map("xs" -> set(Seq("a"))), Map("xs" -> append("b")), Map("xs" -> append("c"))))
    assert(out("xs") == Seq("a", "b", "c"))
  }
}
