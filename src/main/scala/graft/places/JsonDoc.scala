package graft.places

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** JSON ⇄ Scala-document conversion for the change algebra and fixture
  * ingestion (bootstrap JSON sources — SURVEY §2 A11). Jackson ships with
  * Spark. Documents are Map[String, Any] / Seq[Any] / scalars, matching
  * ChangeAlgebra's representation. */
object JsonDoc {
  private val mapper = new ObjectMapper()

  def toDoc(node: JsonNode): Any =
    if (node == null || node.isNull) null
    else if (node.isObject)
      node.properties().asScala.map(e => e.getKey -> toDoc(e.getValue)).toMap
    else if (node.isArray) node.elements().asScala.map(toDoc).toSeq
    else if (node.isTextual) node.asText()
    else if (node.isIntegralNumber) node.asLong()
    else if (node.isNumber) node.asDouble()
    else if (node.isBoolean) node.asBoolean()
    else node.asText()

  def parse(json: String): Any = toDoc(mapper.readTree(json))

  def parseFile(path: String): Any =
    toDoc(mapper.readTree(new java.io.File(path)))

  def docs(v: Any): Seq[Map[String, Any]] = v match {
    case s: Seq[_] => s.map(_.asInstanceOf[Map[String, Any]])
    case m: Map[_, _] => Seq(m.asInstanceOf[Map[String, Any]])
    case _ => Seq.empty
  }
}
