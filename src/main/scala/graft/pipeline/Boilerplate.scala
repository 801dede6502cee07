package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Markup/boilerplate text extraction — the jusText/trafilatura-style
  * front end every web-scale pipeline runs BEFORE C4-style cleaning
  * ([[TextAnalysis]] p37): tag-soup documents split into BLOCKS at
  * block-level tag boundaries, each block scored by integer
  * cross-multiplied rules, boilerplate blocks (navigation, footers,
  * link farms) dropped, and the document rebuilt from surviving blocks.
  *
  * Rules (the jusText core, words instead of chars so both engines count
  * identically):
  *   - a block is a non-empty tag-stripped segment between block-level
  *     tags (`p div nav footer header h1–h6 li ul ol br section article
  *     aside table tr td`);
  *   - DROP if it has fewer than `minWords` words (too short to be
  *     content);
  *   - DROP if `4 · link_words > words` — link density above 1/4, the
  *     nav-bar signature (link words = words inside `<a …>…</a>`);
  *   - jusText's stopword-density tier composes on top via the p10
  *     quality machinery when a language stopword list is available.
  *
  * Emits one row per document that produced at least one block:
  * (doc_id, n_blocks, n_kept, kept_words, clean_hash) with clean_hash =
  * md5 of the kept block texts (whitespace-normalized, document order,
  * space-joined; md5("") when everything was boilerplate).
  *
  * Scale shape (100 TB): parsing is MAP-ONLY — one regex pass per block,
  * behind an exchange barrier so the interpreted lambdas evaluate once
  * (the [[Dedup.ngramJaccardPairs]] CollapseProject discipline); blocks
  * shuffle ONCE by doc_id for reassembly (word arrays, never raw
  * markup), and the groupBy reuses that partitioning. */
object Boilerplate {

  private val BlockTagRe =
    "(?i)</?(?:p|div|nav|footer|header|h[1-6]|li|ul|ol|br|section|article|aside|table|tr|td)\\b[^>]*>"
  private val LinkRe = "(?is)<a\\b[^>]*>(.*?)</a>"
  private val AnyTagRe = "<[^>]*>"

  def extract(df: DataFrame, idCol: String, htmlCol: String,
              minWords: Int): DataFrame = {
    require(minWords >= 1, s"minWords=$minWords")
    val par = df.sparkSession.sparkContext.defaultParallelism
    // split at block boundaries map-side; one row per raw segment
    val raw = df.repartition(par)
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(htmlCol), BlockTagRe)))
      .toDF("doc_id", "pos", "seg")
    // parse each segment ONCE (words after tag strip, link-word count),
    // then an exchange barrier: every consumer below reads the parsed
    // struct instead of re-running the regex chain per output column
    val parsed = raw.select(col("doc_id"), col("pos"),
        filter(split(regexp_replace(col("seg"), AnyTagRe, " "), "\\s+"),
          w => w =!= "").as("ws"),
        aggregate(regexp_extract_all(col("seg"), lit(LinkRe), lit(1)),
          lit(0),
          (acc, t) => acc +
            size(filter(split(t, "\\s+"), w => w =!= ""))).as("nl"))
      .repartition(par, col("doc_id"))
      .where(size(col("ws")) > 0)
      .select(col("doc_id"), col("pos"), col("ws"),
        size(col("ws")).as("nw"), col("nl"))
    val kept = col("nw") >= minWords && col("nl") * 4 <= col("nw")
    parsed
      .withColumn("keep", kept)
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_blocks"),
        sum(when(col("keep"), 1).otherwise(0)).cast("int").as("n_kept"),
        sum(when(col("keep"), col("nw")).otherwise(0)).cast("long")
          .as("kept_words"),
        md5(array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("pos"), array_join(col("ws"), " ").as("txt"))))),
          b => b.getField("txt")), " ")).as("clean_hash"))
  }
}
