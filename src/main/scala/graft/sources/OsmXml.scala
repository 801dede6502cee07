package graft.sources

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import java.io.StringReader
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** OSM XML sources (SURVEY §2 A1/A2): streaming pull-parse of OSM entity
  * XML and Overpass augmented diffs into typed Datasets.
  *
  * Reference: OsmParser.java:71-159 (kxml2 pull parser, node/way/relation
  * with nd/member/tag children; 85-102,133-155 for `<action>` diff blocks
  * with `<old>`/`<new>` pairs into DiffEntity.java:3-43).
  *
  * Spark-first shape: the unit of parallelism is the FILE (the reference's
  * Overpass cache directory is a pile of .osm.gz chunks — A4); each file is
  * one row of `wholetext` input and parses independently inside a task via
  * JDK StAX (streaming, constant memory in document depth, not size). At
  * 100 TB the ingest lands as many chunk files, so `files → mapPartitions
  * (parse)` scales linearly with no shuffle; entity rows then flow into the
  * normal columnar pipeline (centroid E5, match-id C8, upsert C4).
  */
object OsmXml {

  /** One OSM entity (node/way/relation) in row form. `lat`/`lon` are null
    * for ways/relations until centroid resolution (D8/E5). */
  final case class OsmEntity(
      etype: String, id: Long,
      lat: Option[Double], lon: Option[Double],
      tags: Map[String, String],
      ndRefs: Seq[Long],
      members: Seq[OsmMember],
      version: Option[String], timestamp: Option[String],
      changeset: Option[String])

  final case class OsmMember(mtype: String, ref: Long, role: String)

  /** One augmented-diff action: create/modify/delete with old/new entity
    * snapshots (either may be absent, as in the reference's DiffEntity —
    * named before/after here because `old`/`new` are not valid Java field
    * identifiers for Spark encoders). */
  final case class OsmDiff(action: String, before: Option[OsmEntity],
      after: Option[OsmEntity])

  implicit val entityEnc: Encoder[OsmEntity] = Encoders.product[OsmEntity]
  implicit val diffEnc: Encoder[OsmDiff] = Encoders.product[OsmDiff]

  // StAX factories are not thread-safe; one per partition-task call.
  private def newFactory(): XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  private def attr(r: XMLStreamReader, name: String): Option[String] =
    Option(r.getAttributeValue(null, name))

  /** Parse the entity at the current START_ELEMENT (node/way/relation);
    * consumes through its END_ELEMENT. */
  private def readEntity(r: XMLStreamReader): OsmEntity = {
    val etype = r.getLocalName
    val id = attr(r, "id").map(_.toLong).getOrElse(0L)
    val lat = attr(r, "lat").map(_.toDouble)
    val lon = attr(r, "lon").map(_.toDouble)
    val version = attr(r, "version")
    val timestamp = attr(r, "timestamp")
    val changeset = attr(r, "changeset")
    val tags = mutable.LinkedHashMap.empty[String, String]
    val nds = mutable.ArrayBuffer.empty[Long]
    val members = mutable.ArrayBuffer.empty[OsmMember]
    var depth = 1
    while (depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          depth += 1
          r.getLocalName match {
            case "tag" =>
              // empty keys are scrubbed at source, like B12's store-side scrub
              val k = attr(r, "k").getOrElse("")
              if (k.nonEmpty) tags(k) = attr(r, "v").getOrElse("")
            case "nd" => attr(r, "ref").foreach(v => nds += v.toLong)
            case "member" => members += OsmMember(
              attr(r, "type").getOrElse(""),
              attr(r, "ref").map(_.toLong).getOrElse(0L),
              attr(r, "role").getOrElse(""))
            case _ => ()
          }
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ => ()
      }
    }
    OsmEntity(etype, id, lat, lon, tags.toMap, nds.toSeq, members.toSeq,
      version, timestamp, changeset)
  }

  private val EntityTags = Set("node", "way", "relation")

  /** Parse a full OSM XML document string into its entities (A1). */
  def parseEntities(xml: String): Seq[OsmEntity] = {
    val r = newFactory().createXMLStreamReader(new StringReader(xml))
    val out = mutable.ArrayBuffer.empty[OsmEntity]
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            EntityTags(r.getLocalName))
          out += readEntity(r)
      }
    } finally r.close()
    out.toSeq
  }

  /** Parse an Overpass augmented diff document (A2): `<action type=...>`
    * blocks with `<old>`/`<new>` children; bare entities inside an action
    * (create style) land in `new`. */
  def parseDiffs(xml: String): Seq[OsmDiff] = {
    val r = newFactory().createXMLStreamReader(new StringReader(xml))
    val out = mutable.ArrayBuffer.empty[OsmDiff]
    var action: String = null
    var beforeE: Option[OsmEntity] = None
    var afterE: Option[OsmEntity] = None
    var side: String = null // "old" | "new" | null
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "action" =>
              action = attr(r, "type").getOrElse("modify"); beforeE = None; afterE = None
            case "old" if action != null => side = "old"
            case "new" if action != null => side = "new"
            case t if EntityTags(t) && action != null =>
              val e = Some(readEntity(r))
              if (side == "old") beforeE = e else afterE = e
            case _ => ()
          }
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "action" =>
              out += OsmDiff(action, beforeE, afterE); action = null
            case "old" | "new" => side = null
            case _ => ()
          }
          case _ => ()
        }
      }
    } finally r.close()
    out.toSeq
  }

  /** A1 as a source: directory/glob of .osm XML files → entity Dataset.
    * One task per file; parse is streaming, no whole-dataset state. */
  def entities(spark: SparkSession, path: String): Dataset[OsmEntity] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .as[String].flatMap(parseEntities _)
  }

  /** A2 as a source: augmented-diff XML files → CDC Dataset feeding the
    * upsert pipeline (C4/C6). */
  def diffs(spark: SparkSession, path: String): Dataset[OsmDiff] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .as[String].flatMap(parseDiffs _)
  }

  /** Render an entity as OSM XML (used by the roundtrip query/spec; also
    * the A13-style sink shape for entity exports). */
  def renderEntity(e: OsmEntity): String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val sb = new StringBuilder
    sb ++= s"""<${e.etype} id="${e.id}""""
    e.lat.foreach(v => sb ++= s""" lat="$v"""")
    e.lon.foreach(v => sb ++= s""" lon="$v"""")
    e.version.foreach(v => sb ++= s""" version="${esc(v)}"""")
    e.timestamp.foreach(v => sb ++= s""" timestamp="${esc(v)}"""")
    e.changeset.foreach(v => sb ++= s""" changeset="${esc(v)}"""")
    sb ++= ">"
    e.ndRefs.foreach(n => sb ++= s"""<nd ref="$n"/>""")
    e.members.foreach(m =>
      sb ++= s"""<member type="${esc(m.mtype)}" ref="${m.ref}" role="${esc(m.role)}"/>""")
    e.tags.foreach { case (k, v) => sb ++= s"""<tag k="${esc(k)}" v="${esc(v)}"/>""" }
    sb ++= s"</${e.etype}>"
    sb.toString
  }
}
