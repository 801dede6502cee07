package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators a training-data pipeline runs after dedup and
  * before tokenization: deterministic stratified (re)sampling to balance a
  * mixture, and token-budget sequence packing.
  *
  * Both are designed shuffle-light for 100 TB inputs:
  *  - sampling is one tiny aggregate (stratum sizes, broadcast back) plus a
  *    stateless per-row filter — no shuffle of the corpus itself;
  *  - packing windows per shard (`source`), never globally — a global
  *    order-by would serialize the corpus through one task.
  */
object Sampling {

  /** Deterministic down-sample-to-balance: every stratum is sampled to the
    * size of the smallest one (classic uniform-mixture rebalancing, e.g.
    * per-language). Membership is decided by an integer bucket of the id —
    * reproducible across runs, engines, and cluster sizes, unlike
    * `DataFrame.sample` (partition-RNG-dependent).
    *
    * The keep rule is pure integer math — `bucket * |stratum| <
    * min_stratum_size * buckets` — so no float rounding can disagree
    * between engines at rate boundaries.
    *
    * @param bucket deterministic pseudo-uniform value in [0, buckets) per
    *               row, e.g. `pmod(xxhash64(id), buckets)` (or a portable
    *               multiplicative hash when an external oracle must
    *               reproduce it)
    */
  def stratifiedBalance(df: DataFrame, stratumCol: String, bucket: Column,
                        buckets: Int = 10000): DataFrame = {
    val sizes = df.groupBy(stratumCol).agg(count(lit(1)).as("stratum_n"))
    val minN = min(col("stratum_n")).over(Window.partitionBy()) // tiny: |strata| rows
    val targets = sizes.select(col(stratumCol), col("stratum_n"),
      minN.as("target_n"))
    // broadcast the per-stratum thresholds; corpus rows stream through the
    // filter with no shuffle
    df.withColumn("bucket", bucket)
      .join(broadcast(targets), stratumCol)
      .where(col("bucket") * col("stratum_n") < col("target_n") * lit(buckets.toLong))
  }

  /** Deterministic per-stratum rate sampling — mixture reweighting toward
    * target domain/language proportions. Keeps a row iff
    * `bucket < floor(rate * buckets)`; rates clamp to [0, 1] (down-sampling
    * only — repeat-epoch upsampling belongs to the trainer's data loader).
    * Strata absent from `rates` are dropped (an explicit mixture is a
    * whitelist). Same scale shape as [[stratifiedBalance]]: thresholds
    * broadcast, corpus never shuffles.
    */
  def sampleByRates(df: DataFrame, stratumCol: String, bucket: Column,
                    rates: Map[String, Double], buckets: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val thresholds = rates.toSeq.toDF(stratumCol, "rate")
      .select(col(stratumCol),
        floor(least(greatest(col("rate"), lit(0.0)), lit(1.0)) * buckets)
          .as("threshold"))
    df.withColumn("bucket", bucket)
      .join(broadcast(thresholds), stratumCol)
      .where(col("bucket") < col("threshold"))
      .drop("threshold")
  }

  /** Token-budget sequence packing, the window-based contiguous form: docs
    * in `orderCol` order within each `shardCol` fill fixed `budget`-token
    * sequences; `chunk_id` = which sequence a doc starts in, `offset` = its
    * token offset inside that sequence. A doc may straddle a boundary (the
    * trainer's sequence-splitter handles that); what matters is that
    * packing is deterministic, shard-parallel, and one window scan.
    *
    * Emits: shard, doc id, `n_tokens`, `chunk_id` (global across shards:
    * shard-local index + a per-shard base so ids don't collide), `offset`.
    */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
                    tokens: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
    val before = coalesce(
      sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val local = df.select(col(shardCol), col(orderCol), tokens.as("n_tokens"))
      .withColumn("local_chunk", floor(before / budget))
      .withColumn("offset", (before % budget).cast("long"))
    // per-shard chunk counts are tiny (|shards| rows): broadcast a base
    // offset per shard to make chunk ids globally unique without any
    // global ordering
    val bases = local.groupBy(shardCol)
      .agg((max(col("local_chunk")) + 1).as("n_chunks"))
      .withColumn("chunk_base",
        coalesce(sum(col("n_chunks")).over(
          Window.orderBy(shardCol).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(shardCol), col("chunk_base"))
    local.join(broadcast(bases), shardCol)
      .withColumn("chunk_id", col("chunk_base") + col("local_chunk"))
      .drop("local_chunk", "chunk_base")
  }
}
