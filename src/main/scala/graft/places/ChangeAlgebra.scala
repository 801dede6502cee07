package graft.places

import scala.collection.immutable.TreeMap

/** The reference's change algebra over JSON-ish documents: per-field diff
  * generation and ordered application of change verbs.
  *
  * Documents are Scala values: Map[String, Any] (object), Seq[Any] (array),
  * String/Long/Double/Boolean/null (scalars).
  *
  * Semantics derived from:
  *   - diff generation      PlaceOpObjectHelper.java:120-148 (generateDiff,
  *                          addQuotes) + golden PlaceOpObjectHelperTest.java
  *   - verbs set/delete     PlaceOpObjectHelper.java:259-269
  *   - append/appendmany    MergePlaceBot.java:457-482 (mergeFields)
  *   - path syntax          field paths like `source.osm[1].deleted` and
  *                          `{key.with.dots}` (escaped `\[`/`\]` inside)
  *
  * This is the one piece of the reference the SURVEY flags as genuinely
  * order-dependent custom logic: current state = fold of ops in
  * (block, op, edit) order.
  */
object ChangeAlgebra {

  sealed trait Seg
  final case class Field(name: String) extends Seg
  final case class Index(i: Int) extends Seg

  val Delete = "delete"
  val Set = "set"
  val Append = "append"
  val AppendMany = "appendmany"

  def set(v: Any): Map[String, Any] = TreeMap(Set -> v)
  def append(v: Any): Map[String, Any] = TreeMap(Append -> v)
  def appendMany(v: Seq[Any]): Map[String, Any] = TreeMap(AppendMany -> v)

  /** Reference addQuotes: keys containing `.`, `[` or `]` are wrapped in
    * braces with brackets backslash-escaped. */
  def addQuotes(field: String): String =
    if (field.contains(".") || field.contains("[") || field.contains("]"))
      "{" + field.replace("[", "\\[").replace("]", "\\]") + "}"
    else field

  /** Parse a change path into segments. `a.b[2].{weird.key\[x\]}` →
    * Field(a), Field(b), Index(2), Field(weird.key[x]). */
  def parsePath(path: String): List[Seg] = {
    val out = List.newBuilder[Seg]
    var i = 0
    val n = path.length
    val cur = new StringBuilder
    def flushField(): Unit =
      if (cur.nonEmpty) { out += Field(cur.toString); cur.clear() }
    while (i < n) {
      path.charAt(i) match {
        case '{' =>
          val key = new StringBuilder
          i += 1
          while (i < n && path.charAt(i) != '}') {
            if (path.charAt(i) == '\\' && i + 1 < n &&
                (path.charAt(i + 1) == '[' || path.charAt(i + 1) == ']')) i += 1
            key.append(path.charAt(i))
            i += 1
          }
          i += 1 // past '}'
          out += Field(key.toString)
        case '.' =>
          flushField(); i += 1
        case '[' =>
          flushField()
          val j = path.indexOf(']', i)
          out += Index(path.substring(i + 1, j).toInt)
          i = j + 1
        case c =>
          cur.append(c); i += 1
      }
    }
    flushField()
    out.result()
  }

  /** Reference generateDiff: keys removed from `oldM` → `delete` verb with
    * the old value recorded in `current`; changed/new keys → `set` verb,
    * with the old value in `current` only when it existed. Output maps are
    * sorted (TreeMap), matching the reference's golden test. */
  def generateDiff(prefix: String, oldM: Map[String, Any], newM: Map[String, Any])
      : (TreeMap[String, Any], TreeMap[String, Any]) = {
    var change = TreeMap.empty[String, Any]
    var current = TreeMap.empty[String, Any]
    (oldM.keySet -- newM.keySet).foreach { removed =>
      change += (prefix + addQuotes(removed)) -> Delete
      current += (prefix + addQuotes(removed)) -> oldM(removed)
    }
    newM.foreach { case (tag, no) =>
      val po = oldM.get(tag)
      if (!po.contains(no)) {
        change += (prefix + addQuotes(tag)) -> set(no)
        po.foreach(p => current += (prefix + addQuotes(tag)) -> p)
      }
    }
    (change, current)
  }

  private def applyAt(obj: Any, segs: List[Seg], verb: String, arg: Any): Any =
    segs match {
      case Nil =>
        verb match {
          case Set => arg
          case Delete => Tombstone
          case Append =>
            obj match {
              case null => Seq(arg)
              case xs: Seq[_] => xs :+ arg
              case _ => Seq(arg)
            }
          case AppendMany =>
            val adds = arg.asInstanceOf[Seq[Any]]
            obj match {
              case null => adds
              case xs: Seq[_] => xs ++ adds
              case _ => adds
            }
        }
      case Field(name) :: rest =>
        val m = obj match {
          case mm: Map[_, _] => mm.asInstanceOf[Map[String, Any]]
          case _ => Map.empty[String, Any]
        }
        applyAt(m.getOrElse(name, null), rest, verb, arg) match {
          case Tombstone => m - name
          case v => m + (name -> v)
        }
      case Index(i) :: rest =>
        val xs = obj match {
          case ss: Seq[_] => ss.asInstanceOf[Seq[Any]]
          case _ => Seq.empty[Any]
        }
        val padded = if (i < xs.length) xs else xs ++ Seq.fill(i + 1 - xs.length)(null)
        applyAt(padded(i), rest, verb, arg) match {
          case Tombstone => padded.patch(i, Nil, 1)
          case v => padded.updated(i, v)
        }
    }

  private object Tombstone

  /** Apply one change map (path → verb) to a document, in sorted key order
    * (the reference stores changes in TreeMaps). Verb forms: the string
    * "delete", or a single-entry map {set|append|appendmany: value}. */
  def applyChange(obj: Map[String, Any], change: Map[String, Any]): Map[String, Any] =
    TreeMap.from(change).foldLeft(obj) { case (acc, (path, verbObj)) =>
      val (verb, arg): (String, Any) = verbObj match {
        case Delete => (Delete, null)
        case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          mm.head match { case (v, a) => (v, a) }
        case other => sys.error(s"bad verb: $other")
      }
      applyAt(acc, parsePath(path), verb, arg) match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case other => sys.error(s"change replaced root: $other")
      }
    }

  /** Fold a sequence of edits (already ordered by block/op/edit) into a
    * document. */
  def applyAll(obj: Map[String, Any], changes: Seq[Map[String, Any]]): Map[String, Any] =
    changes.foldLeft(obj)(applyChange)
}
