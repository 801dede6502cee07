package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** String / similarity functions from SURVEY §2 F + the D5 tiered name
  * match, exercised over part names and documents. */
object CatalogText {

  /** F6 `opr:simple_name` (OprExprEvaluatorExt.java:70-78). */
  private def f6(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        lower(regexp_replace(col("p_name"), "[ -]", "")).as("simple_name"))
      .orderBy("p_partkey")

  /** F2 word tokenize with edge-punctuation trim (MergeUtil.java:243-252). */
  private def f2(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        filter(
          transform(split(lower(col("p_name")), " "),
            w => regexp_replace(w, "^\\p{Punct}+|\\p{Punct}+$", "")),
          w => w =!= "").as("words"))
      .select(col("p_partkey"),
        size(col("words")).as("n_words"),
        array_join(array_sort(col("words")), " ").as("word_bag"))
      .orderBy("p_partkey")

  /** F1 word-bag equality join — `checkNames` third clause as a scalable
    * equi-join on the normalized bag (MergeUtil.java:166-195). */
  private def f1(s: SparkSession, d: String): DataFrame = {
    val bags = Tables.part(s, d).select("p_partkey", "p_name")
      .repartition(s.sparkContext.defaultParallelism)
      .select(
        col("p_partkey"),
        array_join(array_sort(filter(split(lower(col("p_name")), " "), w => w =!= "")), " ")
          .as("word_bag"))
    bags.as("a").join(bags.as("b"),
        col("a.word_bag") === col("b.word_bag") &&
        col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey").as("a_key"), col("b.p_partkey").as("b_key"),
        col("a.word_bag").as("word_bag"))
      .orderBy("a_key", "b_key")
  }

  /** F3 adaptive-Levenshtein similarity join, bucketed by brand to bound the
    * candidate set (MergeUtil.java:254-284); threshold 4 = the reference's
    * max word-edit budget, and keeps the output selective. */
  private def f3(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"), col("p_name"))
    // spread the probe side: when the build side broadcasts, without this
    // the whole brand-blocked pair enumeration + levenshtein runs inside
    // the single-file scan task (measured 13s serial at sf0.1). No
    // broadcast HINT on the build side though: the relation is the full
    // part table — unbounded at scale — so AQE must stay free to fall
    // back to a shuffled join on p_brand (it still broadcasts at small
    // runtime sizes, keeping this plan at bench scale).
    p.repartition(s.sparkContext.defaultParallelism).as("a")
      .join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
        col("a.p_partkey") < col("b.p_partkey"))
      // 3-arg levenshtein early-exits past the threshold (returns -1)
      .withColumn("lev", levenshtein(col("a.p_name"), col("b.p_name"), 4))
      .where(col("lev") >= 0)
      .select(col("a.p_partkey").as("a_key"), col("b.p_partkey").as("b_key"), col("lev"))
      .orderBy("a_key", "b_key")
  }

  /** F7 `str:first_non_empty` with ';' truncation (OprExprEvaluatorExt.java:40-58). */
  private def f7(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        coalesce(
          nullif(substring_index(col("source"), ";", 1), lit("")),
          nullif(substring_index(col("lang"), ";", 1), lit("")),
          lit(null)).as("first_non_empty"))
      .orderBy("doc_id")

  /** F9 capitalize-first + underscore prettify (BaseOprPlaceDataProvider.java:174-175). */
  private def f9(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        concat(upper(substring(replace(col("p_type"), lit("_"), lit(" ")), 1, 1)),
               substring(replace(col("p_type"), lit("_"), lit(" ")), 2, 1000000))
          .as("pretty_type"))
      .orderBy("p_partkey")

  /** F11 date arithmetic family (BaseOprPlaceDataProvider.java:72,125-134;
    * MergePlaceBot.java:115-122,267-288). */
  private def f11(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("day"))
      .select(col("o_orderkey"), col("day"),
        date_add(col("day"), 1).as("next_day"),
        add_months(col("day"), -1).as("month_ago"),
        datediff(lit("1996-01-01").cast("date"), col("day")).as("days_to_96"),
        (datediff(lit("1996-01-01").cast("date"), col("day")) >= 10).as("grace_passed"))
      .where(col("o_orderkey") <= 2000)
      .orderBy("o_orderkey")

  /** D5 tiered similarity match (MergePlaceBot.java:359-392; MergeUtil.java:35-82)
    * over synthesized tag maps, with the standard block-then-verify shape:
    * brand blocking → cheap codegen'd prefilter (banded builtin levenshtein
    * on simplified names, or wikidata equality) → exact tier UDF only on
    * survivors. The UDF carries the reference's collator/sub-collection
    * semantics; the prefilter bounds how many pairs ever reach it.
    * Collator semantics are UDF-side → rows-only; exactness is covered by
    * the merge fixture specs. */
  private def d5(s: SparkSession, d: String): DataFrame = {
    // With tag maps of shape {name, wikidata}, matchTier reduces exactly to
    // NAME_MATCH else OTHER_TAGS_MATCH (OTHER_NAME re-checks the same name;
    // EMPTY never fires on non-empty part names). The fuzzy name-pair
    // relation is generated DISTRIBUTEDLY by SimilarityJoin.namePairs
    // (positional segment-pigeonhole block-then-verify — no driver collect,
    // no O(V²) loop; at 10⁸ real place names the old driver loop would be
    // 10¹⁶ comparisons). No broadcast hint: the pair relation is
    // vocabulary-sized and thus UNBOUNDED at planetary scale — AQE picks
    // broadcast when the runtime size allows and falls back to a shuffled
    // hash join when it doesn't, which is the only safe default.
    val names = Tables.part(s, d).select(col("p_name").as("nm")).distinct()
    val nm = graft.text.SimilarityJoin.namePairs(names).select("nm_a", "nm_b")
    val p = Tables.part(s, d).select(
        col("p_partkey"), col("p_brand"), col("p_name"),
        when(col("p_partkey") % 7 === 0, concat(lit("Q"), col("p_partkey") % 100)).as("wiki"))
      .repartition(s.sparkContext.defaultParallelism)
      .cache()
    // Candidates come from the match keys themselves, never from brand
    // blocking alone: a brand-blocked all-pairs join is quadratic in brand
    // size (8M pair evaluations here; unbounded at 100 TB). Name tier =
    // equi-join through the distributed name-pair table on (brand, both
    // names); tag tier = equi-join on (brand, wikidata). A pair matching
    // both tiers takes the better one (min priority), as the reference's
    // cascade does.
    val nameCand = p.as("a")
      .join(nm, col("a.p_name") === col("nm_a"))
      .join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") && col("b.p_name") === col("nm_b") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey").as("a_key"), col("b.p_partkey").as("b_key"),
        lit(0).as("pri"))
    val pw = p.where(col("wiki").isNotNull)
    val wikiCand = pw.as("a")
      .join(pw.as("b"),
        col("a.p_brand") === col("b.p_brand") && col("a.wiki") === col("b.wiki") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey").as("a_key"), col("b.p_partkey").as("b_key"),
        lit(1).as("pri"))
    nameCand.unionByName(wikiCand)
      .groupBy("a_key", "b_key").agg(min(col("pri")).as("pri"))
      .select(col("a_key"), col("b_key"),
        when(col("pri") === 0, "NameMatch").otherwise("OtherTagsMatch").as("tier"))
      .orderBy("a_key", "b_key")
  }

  val entries: Seq[Q] = Seq(
    Q("f6_simple_name", f6,
      Some("""SELECT p_partkey, lower(regexp_replace(p_name, '[ -]', '', 'g')) AS simple_name
             |FROM part ORDER BY p_partkey""".stripMargin)),
    Q("f2_tokenize", f2,
      Some("""WITH w AS (
             |  SELECT p_partkey,
             |         list_filter(list_transform(string_split(lower(p_name), ' '),
             |           w -> regexp_replace(w, '^[[:punct:]]+|[[:punct:]]+$', '', 'g')),
             |           w -> w <> '') AS words
             |  FROM part)
             |SELECT p_partkey, CAST(len(words) AS INT) AS n_words,
             |       array_to_string(list_sort(words), ' ') AS word_bag
             |FROM w ORDER BY p_partkey""".stripMargin)),
    Q("f1_word_bag_join", f1,
      Some("""WITH bags AS (
             |  SELECT p_partkey,
             |         array_to_string(list_sort(list_filter(string_split(lower(p_name), ' '),
             |           w -> w <> '')), ' ') AS word_bag
             |  FROM part)
             |SELECT a.p_partkey AS a_key, b.p_partkey AS b_key, a.word_bag AS word_bag
             |FROM bags a JOIN bags b
             |  ON a.word_bag = b.word_bag AND a.p_partkey < b.p_partkey
             |ORDER BY a_key, b_key""".stripMargin)),
    Q("f3_levenshtein_join", f3,
      Some("""SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
             |       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev
             |FROM part a JOIN part b
             |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
             |WHERE levenshtein(a.p_name, b.p_name) <= 4
             |ORDER BY a_key, b_key""".stripMargin)),
    Q("f7_first_non_empty", f7,
      Some("""SELECT doc_id,
             |       coalesce(nullif(split_part(source, ';', 1), ''),
             |                nullif(split_part(lang, ';', 1), '')) AS first_non_empty
             |FROM documents ORDER BY doc_id""".stripMargin)),
    Q("f9_prettify", f9,
      Some("""SELECT p_partkey,
             |       concat(upper(substr(replace(p_type, '_', ' '), 1, 1)),
             |              substr(replace(p_type, '_', ' '), 2)) AS pretty_type
             |FROM part ORDER BY p_partkey""".stripMargin)),
    Q("f11_date_math", f11,
      Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS day,
             |       CAST(o_orderdate AS DATE) + 1 AS next_day,
             |       CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 MONTH AS DATE) AS month_ago,
             |       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1996-01-01') AS INT) AS days_to_96,
             |       datediff('day', CAST(o_orderdate AS DATE), DATE '1996-01-01') >= 10 AS grace_passed
             |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin)),
    Q("d5_tiered_match", d5,
      // checkNames replicated in SQL: on ASCII-lowercased input, collator
      // PRIMARY equality degenerates to plain equality, so the four clauses
      // (equality, whitespace-stripped, sorted word bag, pair-counting
      // sub-collection with the adaptive Levenshtein budget) are all
      // expressible with nested list lambdas.
      Some("""WITH p AS (SELECT p_partkey, p_brand, lower(p_name) AS nl,
             |             CASE WHEN p_partkey % 7 = 0 THEN 'Q' || (p_partkey % 100) END AS wiki
             |           FROM part),
             |t AS (SELECT p_partkey, p_brand, nl, wiki,
             |        replace(nl, ' ', '') AS nospace,
             |        list_sort(list_filter(string_split(nl, ' '), w -> w <> '')) AS toks
             |      FROM p),
             |j AS (SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
             |        CASE WHEN a.nl = b.nl OR a.nospace = b.nospace OR a.toks = b.toks
             |          OR (len(a.toks) > 0 AND list_sum(list_transform(b.toks, wm ->
             |                len(list_filter(a.toks, ws -> levenshtein(wm, ws) <=
             |                  CASE WHEN least(length(wm), length(ws)) <= 4 THEN 1
             |                       WHEN least(length(wm), length(ws)) <= 6 THEN 2
             |                       WHEN least(length(wm), length(ws)) <= 8 THEN 3
             |                       ELSE 4 END)))) >= len(a.toks))
             |          OR (len(b.toks) > 0 AND list_sum(list_transform(a.toks, wm ->
             |                len(list_filter(b.toks, ws -> levenshtein(wm, ws) <=
             |                  CASE WHEN least(length(wm), length(ws)) <= 4 THEN 1
             |                       WHEN least(length(wm), length(ws)) <= 6 THEN 2
             |                       WHEN least(length(wm), length(ws)) <= 8 THEN 3
             |                       ELSE 4 END)))) >= len(b.toks))
             |        THEN 'NameMatch'
             |        WHEN a.wiki IS NOT NULL AND a.wiki = b.wiki THEN 'OtherTagsMatch' END AS tier
             |      FROM t a JOIN t b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey)
             |SELECT a_key, b_key, tier FROM j WHERE tier IS NOT NULL
             |ORDER BY a_key, b_key""".stripMargin)),
  )
}
