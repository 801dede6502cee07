package graft.text

import java.text.Collator
import java.util.Locale

/** Name-similarity semantics from the reference's merge pipeline, as pure
  * Scala (wrapped in UDFs by callers). This is the subtlest contract in the
  * reference — merge correctness hangs on it — so the quirks are replicated
  * faithfully (pair-counting sub-collection match, raw-lowercase Levenshtein,
  * "name appeared" empty-tier rule).
  *
  *   - simpleName            OprExprEvaluatorExt.java:70-78
  *   - firstNonEmpty         OprExprEvaluatorExt.java:40-58
  *   - tokenize              MergeUtil.java:243-252 (punct regex :28)
  *   - checkNames            MergeUtil.java:166-195
  *   - isSubCollection       MergeUtil.java:254-284
  *   - match tiers           MergeUtil.java:35-82
  *
  * Deviation (documented, SURVEY §7.5): the reference uses the JVM default
  * locale's collator; we pin Locale.ROOT for reproducibility.
  */
object TextFunctions {

  /** `opr:simple_name`: strip spaces and hyphens, lowercase. */
  def simpleName(s: String): String =
    if (s == null) null else s.replaceAll("[ -]", "").toLowerCase(Locale.ROOT)

  /** `str:first_non_empty`: concatenate args each truncated at its first
    * ';', returning the first non-empty result. */
  def firstNonEmpty(args: Seq[String]): String =
    args.iterator
      .filter(a => a != null && a.nonEmpty)
      .map(a => a.split(";", 2)(0))
      .find(_.nonEmpty)
      .orNull

  private val PunctEdge = "^\\p{Punct}+|\\p{Punct}+$"

  /** Word tokenize: split on single spaces, trim edge punctuation, drop
    * empties (MergeUtil.getWords). */
  def tokenize(s: String): List[String] =
    if (s == null) Nil
    else s.split(" ").iterator
      .map(_.trim.replaceAll(PunctEdge, ""))
      .filter(_.nonEmpty)
      .toList

  // Collator PRIMARY: case- and accent-insensitive comparison. Not
  // thread-safe → one instance per thread.
  private val collator = ThreadLocal.withInitial[Collator] { () =>
    val c = Collator.getInstance(Locale.ROOT)
    c.setStrength(Collator.PRIMARY)
    c
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 128) return false; i += 1 }
    true
  }

  def collatorEquals(a: String, b: String): Boolean = {
    if (a == null || b == null) return false
    // ASCII fast path: PRIMARY-strength collation on ASCII degenerates to
    // case-insensitive equality; the Collator is ~100x slower
    if (isAscii(a) && isAscii(b)) a.equalsIgnoreCase(b)
    else collator.get().compare(a, b) == 0
  }

  def isEmpty(s: String): Boolean = s == null || s.isEmpty

  def levenshtein(a: String, b: String): Int = {
    val m = a.length; val n = b.length
    if (m == 0) return n
    if (n == 0) return m
    var prev = Array.tabulate(n + 1)(identity)
    var curr = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      curr(0) = i
      var j = 1
      while (j <= n) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(n)
  }

  /** levenshtein(a,b) <= k, with the cheap length-difference reject and
    * early exit once a full DP row exceeds k — the hot path of the merge
    * pipeline (every candidate word pair goes through this). */
  def levenshteinWithin(a: String, b: String, k: Int): Boolean = {
    val m = a.length; val n = b.length
    if (math.abs(m - n) > k) return false
    if (m == 0) return n <= k
    if (n == 0) return m <= k
    var prev = Array.tabulate(n + 1)(identity)
    var curr = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      curr(0) = i
      var rowMin = i
      var j = 1
      while (j <= n) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        val v = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        curr(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > k) return false
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(n) <= k
  }

  /** Edit-distance budget keyed on the SHORTER word's length
    * (MergeUtil.getMaxLevenshteinDistance). */
  def maxLevenshtein(a: String, b: String): Int = {
    val len = math.min(a.length, b.length)
    if (len <= 4) 1
    else if (len <= 6) 2
    else if (len <= 8) 3
    else 4
  }

  /** Reference's pair-counting containment: count (main, sub) word pairs
    * that match by collator equality OR Levenshtein within budget; true once
    * the count reaches subList.size(). NOTE: deliberately replicates the
    * reference's cumulative counting (one main word matching several sub
    * words contributes several counts). */
  def isSubCollection(mainList: Seq[String], subList: Seq[String]): Boolean = {
    if (subList.isEmpty) return false
    var matched = 0
    for (wm <- mainList; ws <- subList) {
      if (collatorEquals(wm, ws) || levenshteinWithin(wm, ws, maxLevenshtein(wm, ws))) {
        matched += 1
        if (matched == subList.size) return true
      }
    }
    false
  }

  /** Four-way name equality of `checkNames` (MergeUtil.java:166-195), on
    * lowercased input: collator equality; whitespace-stripped equality;
    * sorted-word-list equality; sub-collection either way. Empty names never
    * match. */
  def checkNames(oldName: String, newName: String): Boolean = {
    if (isEmpty(oldName) || isEmpty(newName)) return false
    val ol = oldName.toLowerCase(Locale.ROOT)
    val nl = newName.toLowerCase(Locale.ROOT)
    if (collatorEquals(ol, nl)) return true
    if (ol.replaceAll("\\s+", "") == nl.replaceAll("\\s+", "")) return true
    val ow = tokenize(ol).sorted
    val nw = tokenize(nl).sorted
    ow == nw || isSubCollection(nw, ow) || isSubCollection(ow, nw)
  }

  /** checkNames over pre-normalized inputs (lowercased name, whitespace-
    * stripped form, sorted token list computed once per ROW instead of per
    * pair) — the semantics of [[checkNames]] exactly, for hot joins where
    * per-pair tokenization dominates. */
  def checkNamesPre(aLow: String, aNospace: String, aSorted: Seq[String],
                    bLow: String, bNospace: String, bSorted: Seq[String]): Boolean = {
    if (isEmpty(aLow) || isEmpty(bLow)) return false
    collatorEquals(aLow, bLow) || aNospace == bNospace || aSorted == bSorted ||
      isSubCollection(bSorted, aSorted) || isSubCollection(aSorted, bSorted)
  }

  /** Values of tags whose key starts with "name" or equals "old_name"
    * (MergeUtil.getOtherPlaceName). Includes the plain "name" key itself,
    * as in the reference. */
  def otherNames(tags: Map[String, String]): Seq[String] =
    if (tags == null) Seq.empty
    else tags.iterator.collect {
      case (k, v) if k.startsWith("name") || k == "old_name" => v
    }.toSeq

  /** Both non-empty and equal (MergeUtil.equalsNotEmptyStringValue). */
  def nonEmptyEquals(a: String, b: String): Boolean =
    !isEmpty(a) && !isEmpty(b) && a == b

  /** Match tiers, strongest first (MergeUtil.MatchType). allow2PlacesMerge
    * is false only for EMPTY_NAME_MATCH. */
  sealed abstract class MatchType(val tier: Int, val allow2PlacesMerge: Boolean) {
    def matches(oldTags: Map[String, String], newTags: Map[String, String]): Boolean
  }
  case object NameMatch extends MatchType(0, true) {
    def matches(o: Map[String, String], n: Map[String, String]): Boolean =
      checkNames(o.getOrElse("name", null), n.getOrElse("name", null))
  }
  case object OtherTagsMatch extends MatchType(1, true) {
    def matches(o: Map[String, String], n: Map[String, String]): Boolean =
      nonEmptyEquals(o.getOrElse("wikidata", null), n.getOrElse("wikidata", null)) ||
      nonEmptyEquals(o.getOrElse("website", null), n.getOrElse("website", null))
  }
  case object OtherNameMatch extends MatchType(2, true) {
    def matches(o: Map[String, String], n: Map[String, String]): Boolean = {
      val on = otherNames(o); val nn = otherNames(n)
      nn.exists(name => on.exists(name2 => checkNames(name2, name)))
    }
  }
  case object EmptyNameMatch extends MatchType(3, false) {
    // Both empty, or name newly appeared (old empty) — the reference's two
    // branches collapse to "old name empty".
    def matches(o: Map[String, String], n: Map[String, String]): Boolean =
      isEmpty(o.getOrElse("name", null))
  }

  val allMatchTypes: Seq[MatchType] =
    Seq(NameMatch, OtherTagsMatch, OtherNameMatch, EmptyNameMatch)

  /** First matching tier in enum order, if any. */
  def matchTier(oldTags: Map[String, String], newTags: Map[String, String],
                types: Seq[MatchType] = allMatchTypes): Option[MatchType] =
    types.find(_.matches(oldTags, newTags))
}
