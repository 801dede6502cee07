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

  val entries: Seq[Q] = Seq(
    Q("a1_osm_xml_scan", a1,
      Some(s"""SELECT 'node' AS etype, c_custkey AS id,
              |  (${Synth.latSql.format("c_custkey")}) AS lat,
              |  (${Synth.lonSql.format("c_custkey")}) AS lon,
              |  lower(c_mktsegment) AS amenity,
              |  'Shop ' || (c_custkey % 100) AS name,
              |  '3' AS version, '2021-06-01T00:00:00Z' AS osm_ts
              |FROM customer ORDER BY id""".stripMargin)),
    Q("c9_legacy_migration", c9,
      Some("""SELECT c_custkey AS key, 2 AS n_osm_after,
             |  'source.osm=append:node/' || (c_custkey + 5000000) || '@2021-06-01'
             |    AS migrate_ops
             |FROM customer WHERE c_custkey % 4 = 0 ORDER BY key""".stripMargin)),
  )
}
