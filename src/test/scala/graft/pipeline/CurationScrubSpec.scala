package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Semantics of the corpus-curation scrub operators on hand-built inputs
  * with known expected outputs: duplicated-span removal (RefinedWeb/C4
  * rule over fixed-width spans) and PII redaction. */
class CurationScrubSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("curation-scrub")
    .getOrCreate()

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("spanScrub drops exactly the spans shared across documents") {
    import spark.implicits._
    // spans of width 2: doc 1 = [a b][c d][e f], doc 2 = [a b][x y],
    // doc 3 = [c d] [c d] (intra-doc repeat, unique to doc 3)
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b x y"),
      (3L, "c d c d")).toDF("id", "text")
    val got = Dedup.spanScrub(df, "id", "text", spanWords = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // doc 1 loses [a b] (shared with 2) and [c d] (shared with 3)
    assert(got(1L) === ((3, 2, md5Hex("e f"))))
    // doc 2 loses [a b], keeps [x y]
    assert(got(2L) === ((2, 1, md5Hex("x y"))))
    // doc 3: [c d] appears in docs 1 and 3 → dropped twice → empty text;
    // the intra-doc repeat alone would NOT have dropped it (n_docs counts
    // distinct documents)
    assert(got(3L) === ((2, 2, md5Hex(""))))
  }

  test("spanScrub keeps intra-document repeats when no other doc shares the span") {
    import spark.implicits._
    val df = Seq((1L, "p q p q"), (2L, "r s t u")).toDF("id", "text")
    val got = Dedup.spanScrub(df, "id", "text", spanWords = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got(1L) === ((2, 0, md5Hex("p q p q"))))
    assert(got(2L) === ((2, 0, md5Hex("r s t u"))))
  }

  test("spanScrub: short docs form one partial span; width divides evenly too") {
    import spark.implicits._
    val df = Seq((1L, "solo"), (2L, "a b c d")).toDF("id", "text")
    val got = Dedup.spanScrub(df, "id", "text", spanWords = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(got(1L) === ((1, 0))) // one 1-word span, nothing dropped
    assert(got(2L) === ((2, 0))) // exactly two full spans, no ghost third
  }

  test("exactSubstrSpans catches an unaligned repeat that spanScrub provably misses") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog until winter comes"
    // copy starts MID-WORD (char 6 of a) behind TWO junk words, so no
    // fixed-width word span of the copy aligns with any span of a
    val b = "zz yy " + a.substring(6)
    val df = Seq((1L, a), (2L, b)).toDF("id", "text")

    // p18's rule sees nothing: every word span differs
    val p18 = Dedup.spanScrub(df, "id", "text", spanWords = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(p18.values.forall(_ == 0), s"spanScrub should miss: $p18")

    // char-level anchors see the whole copied region, and ONLY in the
    // later doc (keep-first: doc 1 is canonical)
    val got = Dedup.exactSubstrSpans(df, "id", "text",
        k = 8, stride = 1, maxExt = 100, bucketCap = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.forall(_._1 == 2L), s"canonical doc must have no spans: ${got.toSeq}")
    // one island covering exactly the copy: b[6..) (left extension stops:
    // b[5]=' ' vs a[5]='u')
    assert(got.toSeq == Seq((2L, 6, b.length - 6)), got.toSeq)
  }

  test("exactSubstrSpans: intra-document repeat at arbitrary offset, first kept") {
    import spark.implicits._
    val t = "abcdefghijklmnop qq abcdefghijklmnop"
    val df = Seq((1L, t)).toDF("id", "text")
    val got = Dedup.exactSubstrSpans(df, "id", "text",
        k = 8, stride = 1, maxExt = 100, bucketCap = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    // second copy spans chars [20, 36); char 19 is ' ' both before pos 20
    // and... before pos 0 nothing — left extension compares t[19]=' ' with
    // t[-1] → stops at the boundary; but t[19]=' ' vs t[...]: the witness
    // at pos 20 extends left while chars match: t[19]=' ' vs canonical
    // t[-1] (out of range) → extL=0
    assert(got == Seq((1L, 20, 16)), got)
  }

  test("exactSubstrScrub removes islands; untouched docs hash to their original text") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog until winter comes"
    val b = "zz yy " + a.substring(6)
    val c = "completely original content with nothing shared at all here"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "text")
    val got = Dedup.exactSubstrScrub(df, "id", "text",
        k = 8, stride = 1, maxExt = 100, bucketCap = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got(1L) == ((0, 0, md5Hex(a))))
    assert(got(2L) == ((1, b.length - 6, md5Hex("zz yy "))))
    assert(got(3L) == ((0, 0, md5Hex(c))))
  }

  test("exactSubstrSpans: sparse anchors (stride>1) stay inside the true duplicated region") {
    import spark.implicits._
    val shared = "A shared paragraph that appears verbatim in both documents with enough length to anchor"
    val a = "first document intro. " + shared + " closing remarks follow."
    val b = "second doc has other words. " + shared + " and then diverges completely."
    val df = Seq((1L, a), (2L, b)).toDF("id", "text")
    val got = Dedup.exactSubstrSpans(df, "id", "text",
        k = 12, stride = 3, maxExt = 20, bucketCap = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got.nonEmpty, "a ~90-char shared run at stride 3 must anchor")
    val lo = b.indexOf(shared)
    val hi = lo + shared.length
    got.foreach { case (id, s, l) =>
      assert(id == 2L, "keep-first: doc 1 is canonical")
      // spans may under-cover with capped extension but never spill
      // beyond the true duplicated region plus its coincidentally-equal
      // border chars (". " before: 2; " " after: 1)
      assert(s >= lo - 2 && s + l <= hi + 1, s"span [$s, ${s + l}) outside [$lo, $hi)")
    }
  }

  test("repetitionSignals: hand-computed Gopher fractions") {
    import spark.implicits._
    // doc 1: "ab cd ab cd ef" — words chars = 10
    //   2-grams: [ab cd]x2, [cd ab]x1, [cd ef]x1 → top2 = 2*4=8, dup2 = 8
    //   3-grams: all distinct → top3 = 6, dup3 = 0
    // doc 2: one word → no grams, all zeros
    // doc 3: "x x x" — chars=3; 2-grams [x x]x2 → top2=dup2=4 → clamp to 1.0
    val df = Seq((1L, "ab cd ab cd ef"), (2L, "solo"), (3L, "x x x"))
      .toDF("id", "text")
    val got = TextAnalysis.repetitionSignals(df, "id", "text", Seq(2, 3))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) === ((0.8, 0.8, 0.6, 0.0)))
    assert(got(2L) === ((0.0, 0.0, 0.0, 0.0)))
    assert(got(3L) === ((1.0, 1.0, 1.0, 0.0)))
  }

  test("bigramPerplexity: hand-computed bigram model, unk mapping, short docs") {
    import spark.implicits._
    // corpus: "a a b" and "a c"; topK=2 keeps {a, b} (count 3,1; c loses the
    // b-vs-c count tie? no: counts a=3, b=1, c=1 → tie b/c broken by word → b)
    // mapped: doc1 = [a, a, b], doc2 = [a, unk]
    // unigrams: a=3, b=1, unk=1; bigrams: (a,a)=1, (a,b)=1, (a,unk)=1
    // alpha=0.5, V=topK+1=3 → denom(a)=3+1.5=4.5
    // doc1: lnP(a,a)=ln(1.5/4.5), lnP(a,b)=ln(1.5/4.5) → ppl=4.5/1.5=3.0
    // doc2: lnP(a,unk)=ln(1.5/4.5) → ppl=3.0
    // doc3: one word → no bigrams → (0, 0.0)
    val df = Seq((1L, "a a b"), (2L, "a c"), (3L, "solo"))
      .toDF("id", "text")
    val got = TextAnalysis.bigramPerplexity(df, "id", "text", topK = 2, alpha = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(got(1L) === ((2, 3.0)))
    assert(got(2L) === ((1, 3.0)))
    assert(got(3L) === ((0, 0.0)))
  }

  test("contaminationFlags: overlap fractions against a benchmark set") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 2-grams; benchmark doc 100 = "a b c" → bench grams {a b, b c}
    val corpus = Seq(
      (1L, "a b c d"),   // grams {a b, b c, c d} → 2/3 contaminated
      (2L, "x y z"),     // grams {x y, y z} → 0
      (3L, "zz"),        // no 2-grams → kept with zeros
      (100L, "a b c")).toDF("id", "text")
    val bench = corpus.where(col("id") === 100L)
    val got = Dedup.contaminationFlags(corpus, bench, "id", "text", n = 2, minFrac = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) === ((3, 2, 0.666667, true)))
    assert(got(2L) === ((2, 0, 0.0, false)))
    assert(got(3L) === ((0, 0, 0.0, false)))
    assert(got(100L) === ((2, 2, 1.0, true)))
    // the benchmark side must be the broadcast build side: no shuffle of
    // corpus text, and no sort-merge join in the plan
    val plan = Dedup.contaminationFlags(corpus, bench, "id", "text", 2, 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark not broadcast:\n$plan")
  }

  test("substrContamination catches an unaligned eval slice the n-gram screen under-counts") {
    import spark.implicits._
    // eval sentence; the corpus doc embeds eval.substring(10, 55) —
    // starting MID-WORD — after char 123 of 240 chars of filler
    val evalText = "the quick brown fox jumps over a lazy dog while the band plays waltzes on"
    val filler = (1 to 40).map(i => f"w$i%03d").mkString(" ") // 240 chars, no letters shared with the slice boundaries
    val slice = evalText.substring(10, 55) // 45 chars, unaligned both ends
    val doc1 = filler.substring(0, 123) + slice + filler.substring(123)
    val corpus = Seq((1L, doc1), (2L, filler)).toDF("id", "text")
    val bench = Seq((100L, evalText)).toDF("id", "text")

    // the word-5-gram screen sees only the slice's few interior grams —
    // far under its 0.3 fraction threshold → NOT flagged
    val p21 = Dedup.contaminationFlags(corpus, bench, "id", "text",
        n = 5, minFrac = 0.3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(!p21(1L), "the fixture must be one the fixed n-gram screen misses")

    // char-level anchors catch the exact 45-char island at its offset
    val got = Dedup.substrContamination(corpus, bench, "id", "text",
        k = 20, stride = 1, maxExt = 100, bucketCap = 8, minFrac = 0.05)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L)._1 == 1, s"one island expected: ${got(1L)}")
    assert(got(1L)._2 == 45L, s"exact slice length expected: ${got(1L)}")
    assert(got(1L)._4, "substring decontamination must flag the doc")
    assert(got(2L) === ((0, 0L, 0.0, false)))
  }

  test("piiScrub counts and redacts emails, phones, IPv4; order prevents half-matches") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to jane.doe+x@mail.example.org or call 555-0199"),
      (2L, "server at 192.168.0.1 and 10.0.42.1 no mail"),
      (3L, "clean text only")).toDF("id", "text")
    val got = TextAnalysis.piiScrub(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    assert(got(1L) === ((1, 1, 0, md5Hex("write to <EMAIL> or call <PHONE>"))))
    assert(got(2L) === ((0, 0, 2, md5Hex("server at <IP> and <IP> no mail"))))
    assert(got(3L) === ((0, 0, 0, md5Hex("clean text only"))))
  }
}
