package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation operators — the measurement half every retrieval /
  * classification pipeline ships with its operators: NDCG for ranked
  * lists, per-class precision/recall/F1 for classifiers. Both are
  * count-shaped aggregations (map-side combinable, bounded outputs) with
  * fixed-order float folds so an external oracle reproduces every score.
  */
object Eval {

  /** NDCG per query over a ranked relation (queryCol, rankCol asc = best
    * first, relCol ∈ {0,1}): DCG folds rel_i / (ln(i+1)/ln 2) in RANK
    * order; IDCG re-ranks the retrieved list ideally (all relevant
    * first), so it is Σ_{i≤n_rel} 1/(ln(i+1)/ln 2) — computed as an
    * index-ordered fold too. A query with no relevant results scores 0.
    * log2 is spelled ln(x)/ln(2) so both engines run the identical IEEE
    * ops (a native log2 may differ in the last ulp). */
  def ndcg(ranked: DataFrame, queryCol: String, rankCol: String,
           rel: Column): DataFrame = {
    val ln2 = log(lit(2.0))
    val byQuery = ranked
      .select(col(queryCol).as("query_id"), col(rankCol).as("rank"),
        rel.cast("int").as("rel"))
      .groupBy("query_id")
      .agg(
        sum(col("rel")).cast("int").as("n_rel"),
        aggregate(
          sort_array(collect_list(struct(col("rank"),
            (col("rel").cast("double") / (log(col("rank") + 1.0) / ln2))
              .as("g")))),
          lit(0.0), (acc, x) => acc + x.getField("g")).as("dcg"))
    byQuery.select(col("query_id"), col("n_rel"),
      round(col("dcg"), 6).as("dcg"),
      round(when(col("n_rel") > 0,
        col("dcg") / aggregate(sequence(lit(1), col("n_rel")),
          lit(0.0), (acc, i) => acc +
            lit(1.0) / (log(i.cast("double") + 1.0) / ln2)))
        .otherwise(0.0), 6).as("ndcg"))
  }

  /** Per-class precision/recall/F1 from a (truth, prediction) relation.
    * Classes = the distinct truth ∪ prediction values, so a class the
    * model never predicts (or invents) still gets a row. All ratios are
    * single double divisions of exact counts; F1 computes from the
    * UNROUNDED precision/recall (same expression shape as the oracle)
    * and every output rounds to 6. */
  def classifierEval(preds: DataFrame, truthCol: String,
                     predCol: String): DataFrame = {
    val t = preds.select(col(truthCol).as("truth"), col(predCol).as("pred"))
    val classes = t.select(col("truth").as("cls"))
      .union(t.select(col("pred").as("cls"))).distinct()
    val tp = t.where(col("truth") === col("pred"))
      .groupBy(col("truth").as("cls")).agg(count(lit(1)).as("tp"))
    val fp = t.where(col("truth") =!= col("pred"))
      .groupBy(col("pred").as("cls")).agg(count(lit(1)).as("fp"))
    val fn = t.where(col("truth") =!= col("pred"))
      .groupBy(col("truth").as("cls")).agg(count(lit(1)).as("fn"))
    val j = classes
      .join(tp, Seq("cls"), "left").join(fp, Seq("cls"), "left")
      .join(fn, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("fp"), lit(0L)).as("fp"),
        coalesce(col("fn"), lit(0L)).as("fn"))
    val p = when(col("tp") + col("fp") > 0,
      col("tp").cast("double") / (col("tp") + col("fp"))).otherwise(0.0)
    val r = when(col("tp") + col("fn") > 0,
      col("tp").cast("double") / (col("tp") + col("fn"))).otherwise(0.0)
    j.select(col("cls"), col("tp"), col("fp"), col("fn"),
      round(p, 6).as("prec"), round(r, 6).as("recall"),
      round(when(p + r > 0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 6)
        .as("f1"))
  }
}
