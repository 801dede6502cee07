package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The two canonical published rule-based corpus filters, as map-only
  * column pipelines (no UDFs, no shuffles — every signal is a codegen'd
  * expression over the text column):
  *
  *  - Gopher quality rules (Rae et al. 2021, arXiv:2112.11446 §A1.1):
  *    word-count window, mean-word-length window, minimum fraction of
  *    alphabetic words, minimum stop-word hits;
  *  - C4 cleaning (Raffel et al. 2019, arXiv:1910.10683 §2.2): terminal
  *    punctuation, minimum sentence count, brace / boilerplate /
  *    "lorem ipsum" / "javascript" rejections.
  *
  * Every KEEP decision that is a ratio threshold is evaluated in INTEGER
  * cross-multiplied form (`5·alpha_words ≥ 4·n_words`, `3n ≤ sum_len ≤
  * 10n`), so the flags are bit-identical across engines and no float
  * rounding can flip a document at a boundary — the reported metric
  * columns are rounded for display, the flags never consult them.
  */
object QualityRules {

  /** The Gopher stop-word probe list (the paper's "must contain ≥ 2 of
    * the, be, to, of, and, that, have, with"). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style quality signals + keep flag per document. Emits
    * (id, n_words, sum_word_len, alpha_words, stopword_hits,
    * mean_word_len, keep).
    *
    * Keep = words in [minWords, maxWords] AND mean word length in
    * [3, 10] (integer form) AND ≥ 80% words containing an alphabetic
    * char (integer form) AND ≥ 2 stop-word hits. */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val ws = TextAnalysis.words(col(textCol))
    val stopArr = array(GopherStopwords.map(lit): _*)
    df.select(
        col(idCol),
        size(ws).as("n_words"),
        aggregate(ws, lit(0L), (a, w) => a + length(w)).as("sum_word_len"),
        size(filter(ws, w => w.rlike("[A-Za-z]"))).as("alpha_words"),
        size(filter(ws, w => array_contains(stopArr, lower(w))))
          .as("stopword_hits"))
      .withColumn("mean_word_len",
        when(col("n_words") > 0,
          round(col("sum_word_len") / col("n_words"), 6)).otherwise(lit(0.0)))
      .withColumn("keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("sum_word_len") >= col("n_words") * 3 &&
          col("sum_word_len") <= col("n_words") * 10 &&
          col("alpha_words") * 5 >= col("n_words") * 4 &&
          col("stopword_hits") >= 2)
  }

  /** C4-style cleaning signals + keep flag per document, applied at the
    * document level (the corpus carries no line breaks; C4's line rules
    * collapse to their document form). Emits (id, n_sentences,
    * ends_terminal, has_brace, has_boilerplate, keep).
    *
    * Keep = ends in terminal punctuation AND ≥ minSentences
    * sentence-ending marks AND no curly brace AND none of the
    * boilerplate markers ("lorem ipsum", "javascript",
    * "terms of use", "privacy policy" — the paper's list, case
    * insensitive). */
  def c4Rules(df: DataFrame, idCol: String, textCol: String,
              minSentences: Int = 3): DataFrame = {
    val t = col(textCol)
    val lowered = lower(t)
    val boilerplate = Seq("lorem ipsum", "javascript", "terms of use",
      "privacy policy")
    df.select(
        col(idCol),
        (length(t) - length(regexp_replace(t, "[.!?]", "")))
          .cast("int").as("n_sentences"),
        // \z (absolute end of input): Java's $ would also match BEFORE a
        // trailing newline, where the oracle's RE2 $ would not — the
        // flags must agree for any input, not just the current corpus
        t.rlike("""[.!?"']\z""").as("ends_terminal"),
        t.contains("{").as("has_brace"),
        boilerplate.map(b => lowered.contains(b)).reduce(_ || _)
          .as("has_boilerplate"))
      .withColumn("keep",
        col("ends_terminal") && col("n_sentences") >= minSentences &&
          !col("has_brace") && !col("has_boilerplate"))
  }
}
