package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.OsmXml

/** Source-layer operators: the OSM XML entity scan (A1) exercised as a
  * render→parse roundtrip over testdata, and the legacy-id migration batch
  * (C9). The raw-file forms of A1/A2 (directory of .osm chunks → Dataset)
  * are covered by OsmXmlSpec; here the same parser runs distributed inside
  * a query so the driver's oracle can check it value-by-value.
  */
object CatalogSources {

  /** A1 Overpass XML scan (OsmParser.java:71-159): render each row as an
    * OSM `<node>` element, concatenate per partition into a document,
    * stream-parse it back, and project the entity fields. The parse is the
    * system under test; the oracle computes the same fields directly. */
  private def a1(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = col("c_custkey")
    val ents = Tables.customer(s, d).select(
        k.as("id"), Synth.lat(k).as("lat"), Synth.lon(k).as("lon"),
        lower(col("c_mktsegment")).as("seg"))
      .as[(Long, Double, Double, String)]
    val parsed = ents.mapPartitions { it =>
      val xml = new StringBuilder("<osm>")
      it.foreach { case (id, lat, lon, seg) =>
        xml ++= OsmXml.renderEntity(OsmXml.OsmEntity("node", id,
          Some(lat), Some(lon),
          Map("amenity" -> seg, "name" -> s"Shop ${id % 100}"),
          Nil, Nil, Some("3"), Some("2021-06-01T00:00:00Z"), None))
      }
      xml ++= "</osm>"
      OsmXml.parseEntities(xml.toString).iterator
    }
    parsed.select(col("etype"), col("id"), col("lat"), col("lon"),
        element_at(col("tags"), "amenity").as("amenity"),
        element_at(col("tags"), "name").as("name"),
        col("version"), col("timestamp").as("osm_ts"))
      .orderBy("id")
  }

  /** A2 augmented-diff CDC (OsmParser.java:85-102,133-155 into
    * DiffEntity.java:3-43): render each row as a create/modify/delete
    * `<action>` block (create uses the bare-entity form), stream-parse the
    * diff document back, then classify each action the way the sync MERGE
    * does (OsmSyncBot.java:730-752; C4/C6 dispatch) with a C1-style tag
    * diff deciding edited-vs-unchanged. The parse + classification is the
    * system under test; the oracle computes the same fields directly. */
  private def a2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = col("c_custkey")
    val rows = Tables.customer(s, d).select(
        k.as("id"), Synth.lat(k).as("lat"), Synth.lon(k).as("lon"),
        lower(col("c_mktsegment")).as("seg"))
      .as[(Long, Double, Double, String)]
    val parsed = rows.mapPartitions { it =>
      val xml = new StringBuilder("<osm>")
      it.foreach { case (id, lat, lon, seg) =>
        val name = s"Shop ${id % 100}"
        def ent(ver: String, nm: String) = OsmXml.OsmEntity("node", id,
          Some(lat), Some(lon), Map("amenity" -> seg, "name" -> nm),
          Nil, Nil, Some(ver), Some("2021-06-01T00:00:00Z"), None)
        (id % 3) match {
          case 0 => // create: bare entity inside the action block
            xml ++= "<action type=\"create\">"
            xml ++= OsmXml.renderEntity(ent("1", name))
            xml ++= "</action>"
          case 1 =>
            val newName = if (id % 2 == 0) name else name + " B"
            xml ++= "<action type=\"modify\"><old>"
            xml ++= OsmXml.renderEntity(ent("2", name))
            xml ++= "</old><new>"
            xml ++= OsmXml.renderEntity(ent("3", newName))
            xml ++= "</new></action>"
          case _ =>
            xml ++= "<action type=\"delete\"><old>"
            xml ++= OsmXml.renderEntity(ent("2", name))
            xml ++= "</old></action>"
        }
      }
      xml ++= "</osm>"
      OsmXml.parseDiffs(xml.toString).iterator
    }
    val nameB = element_at(col("before.tags"), "name")
    val nameA = element_at(col("after.tags"), "name")
    val segB = element_at(col("before.tags"), "amenity")
    val segA = element_at(col("after.tags"), "amenity")
    val changed = !(nameB <=> nameA) || !(segB <=> segA)
    parsed.select(
        coalesce(col("after.id"), col("before.id")).as("id"),
        col("action"),
        when(col("action") === "create", "created")
          .when(col("action") === "delete", "tombstoned")
          .otherwise(when(changed, "edited").otherwise("unchanged"))
          .as("decision"),
        col("before.version").as("old_version"),
        col("after.version").as("new_version"),
        nameA.as("name_after"),
        when(col("action") === "modify",
            (!(nameB <=> nameA)).cast("int") + (!(segB <=> segA)).cast("int"))
          .otherwise(0).as("n_tag_changes"))
      .orderBy("id")
  }

  /** C9 legacy-id migration (MigrateOldOsmPlaceIdsBot.java:40-70): move
    * `source.old-osm-ids[]` into `source.osm[]` as tombstoned sources and
    * emit the append ops. */
  private def c9(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    Tables.customer(s, d).select(k.as("key"),
        array(struct(k.as("id"), lit("node").as("type"),
          lit(null).cast("string").as("deleted"))).as("osm"),
        when(k % 4 === 0, array(k + 5000000L))
          .otherwise(array().cast("array<bigint>")).as("legacy"))
      .select(col("key"),
        (size(col("osm")) + size(col("legacy"))).as("n_osm_after"),
        array_join(transform(col("legacy"),
          x => concat(lit("source.osm=append:node/"), x, lit("@2021-06-01"))), ";")
          .as("migrate_ops"))
      .where(col("migrate_ops") =!= "")
      .orderBy("key")
  }

  /** A11 bootstrap JSON source (OpenPlaceReviewsDbBoot.java:86-93;
    * bootstrap/opr-osm.json): the reference seeds its chain from JSON
    * ARRAYS of op documents. Here each partition renders its rows as one
    * such array document and the Spark JSON source parses them back
    * (root-level arrays explode to one row per element — the bootstrap
    * file shape exactly), with an explicit schema so the read is
    * single-pass. The parse is the system under test; the oracle computes
    * the same fields directly. */
  private def a11(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = col("c_custkey")
    val docs = Tables.customer(s, d).select(
        k.as("id"), lower(col("c_mktsegment")).as("segment"), (k % 100).as("rnk"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        val sb = new StringBuilder("[")
        var first = true
        it.foreach { case (id, seg, r) =>
          if (!first) sb += ','
          first = false
          sb ++= s"""{"type":"opr.place","create":{"id":$id,"segment":"$seg","rank":$r}}"""
        }
        sb += ']'
        if (first) Iterator.empty else Iterator(sb.toString)
      }
    val schema = "type STRING, create STRUCT<id: BIGINT, segment: STRING, rank: BIGINT>"
    s.read.schema(schema).json(docs)
      .select(col("type").as("op_type"), col("create.id").as("id"),
        col("create.segment").as("segment"), col("create.rank").as("rnk"))
      .orderBy("id")
  }

  /** C2-family source enrichment from an external rating feed — the
    * reference's TripAdvisor bot (TripAdvisorBot.java:46-92): for places
    * carrying a `source.tripadvisor` entry, compare the feed's half-star
    * rating and review count against the place's current tags and emit
    * set-ops for whichever changed (the reference's own implementation is
    * mostly TODO; the op shapes follow its C2 builders). Integer half-star
    * units keep both engines' string rendering identical. */
  private def c11(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    Tables.customer(s, d).where(k % 2 === 0).select(k.as("key"),
        when(k % 3 =!= 0, k % 50).as("stars_cur"),
        when(k % 3 =!= 0, k % 1000).as("reviews_cur"),
        ((k + 7) % 50).as("stars_new"),
        ((k * 3) % 1000).as("reviews_new"))
      .withColumn("ops", concat_ws(";",
        when(col("stars_cur").isNull || col("stars_cur") =!= col("stars_new"),
          concat(lit("tags.stars=set:"), col("stars_new").cast("string"))),
        when(col("reviews_cur").isNull || col("reviews_cur") =!= col("reviews_new"),
          concat(lit("tags.reviews=set:"), col("reviews_new").cast("string")))))
      .where(col("ops") =!= "")
      .select(col("key"), col("ops"),
        size(split(col("ops"), ";")).as("n_ops"))
      .orderBy("key")
  }

  val entries: Seq[Q] = Seq(
    Q("a1_osm_xml_scan", a1,
      Some(s"""SELECT 'node' AS etype, c_custkey AS id,
              |  (${Synth.latSql.format("c_custkey")}) AS lat,
              |  (${Synth.lonSql.format("c_custkey")}) AS lon,
              |  lower(c_mktsegment) AS amenity,
              |  'Shop ' || (c_custkey % 100) AS name,
              |  '3' AS version, '2021-06-01T00:00:00Z' AS osm_ts
              |FROM customer ORDER BY id""".stripMargin)),
    Q("a2_diff_fold", a2,
      Some("""SELECT c_custkey AS id,
             |  CASE c_custkey % 3 WHEN 0 THEN 'create' WHEN 1 THEN 'modify'
             |       ELSE 'delete' END AS action,
             |  CASE WHEN c_custkey % 3 = 0 THEN 'created'
             |       WHEN c_custkey % 3 = 2 THEN 'tombstoned'
             |       WHEN c_custkey % 6 = 1 THEN 'edited'
             |       ELSE 'unchanged' END AS decision,
             |  CASE WHEN c_custkey % 3 <> 0 THEN '2' END AS old_version,
             |  CASE c_custkey % 3 WHEN 0 THEN '1' WHEN 1 THEN '3' END AS new_version,
             |  CASE WHEN c_custkey % 3 = 0 THEN 'Shop ' || (c_custkey % 100)
             |       WHEN c_custkey % 3 = 1 THEN 'Shop ' || (c_custkey % 100) ||
             |            CASE WHEN c_custkey % 2 = 1 THEN ' B' ELSE '' END
             |  END AS name_after,
             |  CASE WHEN c_custkey % 6 = 1 THEN 1 ELSE 0 END AS n_tag_changes
             |FROM customer ORDER BY id""".stripMargin)),
    Q("a11_bootstrap_json", a11,
      Some("""SELECT 'opr.place' AS op_type, c_custkey AS id,
             |  lower(c_mktsegment) AS segment, c_custkey % 100 AS rnk
             |FROM customer ORDER BY id""".stripMargin)),
    Q("c11_tripadvisor_ops", c11,
      Some("""WITH t AS (SELECT c_custkey AS key,
             |    CASE WHEN c_custkey % 3 <> 0 THEN c_custkey % 50 END AS stars_cur,
             |    CASE WHEN c_custkey % 3 <> 0 THEN c_custkey % 1000 END AS reviews_cur,
             |    (c_custkey + 7) % 50 AS stars_new,
             |    (c_custkey * 3) % 1000 AS reviews_new
             |  FROM customer WHERE c_custkey % 2 = 0),
             |o AS (SELECT key, concat_ws(';',
             |    CASE WHEN stars_cur IS NULL OR stars_cur <> stars_new
             |         THEN 'tags.stars=set:' || stars_new END,
             |    CASE WHEN reviews_cur IS NULL OR reviews_cur <> reviews_new
             |         THEN 'tags.reviews=set:' || reviews_new END) AS ops
             |  FROM t)
             |SELECT key, ops, CAST(len(string_split(ops, ';')) AS INT) AS n_ops
             |FROM o WHERE ops <> '' ORDER BY key""".stripMargin)),
    Q("c9_legacy_migration", c9,
      Some("""SELECT c_custkey AS key, 2 AS n_osm_after,
             |  'source.osm=append:node/' || (c_custkey + 5000000) || '@2021-06-01'
             |    AS migrate_ops
             |FROM customer WHERE c_custkey % 4 = 0 ORDER BY key""".stripMargin)),
  )
}
