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

  /** Temperature-flattened mixture rebalance at T = 2 (α = 0.5) — the
    * multilingual-LM sampling rule (Conneau & Lample 2019; mBERT/XLM-R):
    * stratum shares flattened from the natural distribution q_l toward
    * uniform, realized by down-sampling only. With α = 0.5 the per-stratum
    * keep rate collapses to a closed form: rate_l = √(c_min / c_l) — the
    * smallest stratum keeps everything, a stratum 100× larger keeps 10×
    * the smallest COUNT (not 100×), which is exactly the α-temperature
    * mixture restricted to rates ≤ 1.
    *
    * α is FIXED at 0.5 rather than a parameter because the rate must be
    * bit-reproducible across engines: IEEE 754 requires correctly-rounded
    * `sqrt` and division (so √(c_min/c_l) is identical everywhere), while
    * `pow(x, 1-α)` is NOT correctly rounded and may differ by ulps between
    * libms — a row at a threshold boundary would then flip membership
    * between engines. General-α callers compose [[sampleByRates]] with
    * rates computed in their own controlled numeric environment.
    *
    * Scale shape: identical to [[stratifiedBalance]] — one tiny stratum
    * count aggregate, thresholds broadcast back, the corpus itself streams
    * through a stateless filter with no shuffle.
    */
  def temperatureBalance(df: DataFrame, stratumCol: String, bucket: Column,
                         buckets: Int = 10000): DataFrame = {
    val sizes = df.groupBy(stratumCol).agg(count(lit(1)).as("stratum_n"))
    val minN = min(col("stratum_n")).over(Window.partitionBy()) // tiny: |strata| rows
    val thresholds = sizes
      .select(col(stratumCol), col("stratum_n"), minN.as("min_n"))
      .select(col(stratumCol), col("stratum_n"),
        floor(sqrt(col("min_n").cast("double") / col("stratum_n")) * buckets)
          .as("threshold"))
    df.withColumn("bucket", bucket)
      .join(broadcast(thresholds), stratumCol)
      .where(col("bucket") < col("threshold"))
      .drop("threshold")
  }

  /** Skew-aware top-k per group: the best `k` rows of every group under
    * the total order (`score` desc, `tieId` asc) — per-domain quality
    * caps à la RefinedWeb (Penedo et al. 2023).
    *
    * Deliberately the plain window form: Catalyst's rank-limit pushdown
    * (SPARK-37099) rewrites `row_number <= k` into a PARTIAL
    * `WindowGroupLimit` below the exchange — each input partition
    * forwards at most k rows per group, so a hot domain holding half the
    * corpus ships ≤ k·numPartitions rows to its reducer instead of half
    * the corpus. Hand-rolled salting (local top-k per hash subgroup,
    * then a final window) would recreate exactly that with one extra
    * shuffle; `CorpusShapingSpec` asserts the Partial node so a Spark
    * upgrade can't silently drop the property.
    *
    * Caveats: the pushdown only fires for k up to
    * `spark.sql.optimizer.windowGroupLimitThreshold` (default 1000) —
    * callers capping above that must raise the threshold or the hot
    * group degrades to one reducer; and the output's `rank` column
    * replaces any same-named input column.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, score: Column,
                   tieId: Column, k: Int): DataFrame = {
    require(k > 0)
    val global = Window.partitionBy(col(groupCol))
      .orderBy(score.desc, tieId.asc)
    df.withColumn("rank", row_number().over(global))
      .where(col("rank") <= k)
  }

  /** Deterministic global shuffle → (shard, pos): the reproducible random
    * permutation a training run reads the corpus in. Each row hashes to a
    * shard (multiplicative hash of its id) and gets a dense 0-based
    * position within that shard (rank by a second, independent hash;
    * id tie-break makes the order total). Unlike `orderBy(rand())` the
    * result is identical across runs, engines, and cluster sizes — and
    * unlike a global sort it never serializes the corpus through one
    * task: one hash-partition shuffle plus a per-shard sort, each shard
    * ~corpus/nShards.
    *
    * The id is folded mod 1e9+7 BEFORE the multiplicative mix, so every
    * intermediate stays below 2^62 — total for any 64-bit id under the
    * default ANSI mode (a bare `id * 2654435761` overflows at ids ≥
    * ~3.5e9 and either crashes the job or silently diverges from the
    * oracle). The product is then reduced mod 1e9+7 AGAIN before the
    * final shard pmod: because the modulus is an odd prime, that step
    * folds the multiplier's high bits into the low bits — without it,
    * `(x * odd) mod 2^k` is just a fixed permutation of `x mod 2^k`, so
    * for a power-of-two shard count any structure in the low id bits
    * (sequential ids, stride-8 ids) would map straight into shards
    * instead of being hashed away. Callers without a cross-engine-oracle
    * constraint can swap the portable hashes for `pmod(xxhash64(id), n)`.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "need at least one shard")
    val m = lit(1000000007L)
    val folded = pmod(col(idCol), m)
    val byShard = Window.partitionBy("shard")
      .orderBy(col("h2"), col(idCol))
    df.select(col(idCol),
        pmod(pmod(folded * lit(2654435761L), m), lit(nShards.toLong)).cast("int").as("shard"),
        pmod(folded * lit(1540483477L) + lit(12345701L), m).as("h2"))
      .withColumn("pos", (row_number().over(byShard) - 1).cast("long"))
      .drop("h2")
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

  /** Per-domain token-budget selection — the mixture-assembly step that
    * turns "this many tokens per domain" targets (The Pile / DoReMi
    * application stage) into a concrete document set. Selection order is
    * a deterministic portable hash of the id (a reproducible uniform
    * sample of each domain), and a document is kept iff its domain's
    * token count BEFORE it in that order is still under the budget — so
    * the kept set always overshoots by at most one document per domain.
    *
    * Scale shape: the naive spelling is one running-sum window
    * partitioned by domain — a hot domain holding half the corpus would
    * serialize through one task. This is the two-pass distributed prefix
    * sum instead: the hash priority is uniform, so its high bits ARE a
    * range partitioning — `bucket = pri·B div M` is monotone in `pri`.
    * Pass 1 computes within-(domain, bucket) running sums (each window
    * sees ~|domain|/B rows) and per-bucket token totals; pass 2 prefixes
    * the (domain, bucket) totals — a tiny |domains|·B relation — and
    * broadcasts the resulting offsets back. No task ever holds more than
    * one bucket of one domain; budgets join in as a broadcast literal
    * relation. Token sums are Long (corpus token counts, ≤ ~10^15 at
    * 100 TB — far from wrap).
    */
  def tokenBudgetMix(df: DataFrame, idCol: String, domainCol: String,
                     tokens: Column, budgets: Map[String, Long],
                     defaultBudget: Long, buckets: Int = 64): DataFrame = {
    require(buckets >= 1 && buckets <= 100000, s"buckets=$buckets")
    val reserved = Seq("pri", "bkt", "n_tokens", "cum_in", "bucket_total",
      "bucket_offset", "budget", "cum_before", "kept")
    Seq(idCol, domainCol).foreach(c => require(!reserved.contains(c),
      s"column $c collides with a reserved name"))
    val m = lit(1000000007L)
    val base = df.select(col(idCol), col(domainCol), tokens.as("n_tokens"))
      // fold before the multiply (the deterministicShuffle overflow lesson)
      .withColumn("pri",
        pmod(pmod(col(idCol), m) * lit(2654435761L) + lit(987654321L), m))
      .withColumn("bkt", expr(s"pri * $buckets div 1000000007").cast("int"))
    val wIn = Window.partitionBy(domainCol, "bkt")
      .orderBy(col("pri"), col(idCol))
    val withIn = base.withColumn("cum_in",
      sum("n_tokens").over(wIn.rowsBetween(Window.unboundedPreceding, 0)))
    // per-bucket totals from the projected base (map-side combined agg;
    // re-scans the source rather than caching a corpus-sized relation)
    val offsets = base.groupBy(domainCol, "bkt")
      .agg(sum("n_tokens").as("bucket_total"))
      .withColumn("bucket_offset", coalesce(
        sum("bucket_total").over(Window.partitionBy(domainCol)
          .orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(domainCol), col("bkt"), col("bucket_offset"))
    val spark = df.sparkSession
    import spark.implicits._
    val budgetDf = budgets.toSeq.toDF(domainCol, "budget")
    withIn.join(broadcast(offsets), Seq(domainCol, "bkt"))
      .join(broadcast(budgetDf), Seq(domainCol), "left")
      .withColumn("cum_before",
        col("bucket_offset") + col("cum_in") - col("n_tokens"))
      .withColumn("kept",
        col("cum_before") < coalesce(col("budget"), lit(defaultBudget)))
      .select(col(idCol), col(domainCol), col("n_tokens"),
        col("cum_before"), col("kept"))
  }

  /** UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151) —
    * the epoch-capped waterfilling that replaced temperature sampling for
    * large multilingual mixtures: split a total token `budget` as evenly
    * as possible across strata, except that no stratum may contribute
    * more than `maxEpochs` passes over its own data. Head languages stop
    * soaking up the pie (they get the uniform share), tail languages are
    * protected from over-repetition (the epoch cap).
    *
    * Exact closed form instead of the paper's sequential loop: with
    * strata ascending by token count (`t_i = c_i·maxEpochs`, prefix sums
    * `S_i`), a stratum is epoch-capped iff `t_i·(n−i+1) + S_{i−1} ≤ B` —
    * the loop's `t ≤ U/k` share test cross-multiplied, so it is the
    * EXACT rational condition with no per-step floor (a floor'd running
    * share would leak remainder tokens to later strata and break the
    * prefix property). That set is a PREFIX of the ascending order —
    * `t` ascending makes the left side monotone in `i` — so the loop's
    * state collapses into two window functions, and the remaining budget
    * splits as `(B − S_j) div (n−j)` over the `n−j` uncapped strata
    * (the ≤ n−j−1 remainder tokens stay unallocated, documented and
    * engine-exact). All arithmetic is integer cross-multiplication, so
    * no rounding can disagree with an external oracle at an allocation
    * boundary.
    *
    * Scale shape: ONE map-side-combined count aggregate over the corpus
    * (|strata| rows out), then the allocation itself is window math over
    * that tiny relation — no driver loop, no collect. Returns one row
    * per stratum: (stratum, stratum_tokens, alloc_tokens, epoch_capped).
    */
  def unimaxBudgets(df: DataFrame, stratumCol: String, tokens: Column,
                    budget: Long, maxEpochs: Int): DataFrame = {
    require(budget > 0 && maxEpochs > 0, s"budget=$budget maxEpochs=$maxEpochs")
    val sizes = df.groupBy(stratumCol)
      .agg(sum(tokens).as("stratum_tokens"))
      .withColumn("t", col("stratum_tokens") * maxEpochs)
    val asc = Window.orderBy(col("t").asc, col(stratumCol).asc)
    val all = Window.partitionBy()
    val ranked = sizes
      .withColumn("i", row_number().over(asc))
      .withColumn("s_before", coalesce(
        sum("t").over(asc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("epoch_capped",
        col("t") * (col("n") - col("i") + 1) + col("s_before") <= budget)
    // j = |capped prefix|, S_j = its token mass: two tiny scalars window-
    // aggregated over the |strata| relation (no second pass, no collect)
    ranked
      .withColumn("j", sum(when(col("epoch_capped"), 1L).otherwise(0L)).over(all))
      .withColumn("s_j", coalesce(
        sum(when(col("epoch_capped"), col("t"))).over(all), lit(0L)))
      .withColumn("alloc_tokens", when(col("epoch_capped"), col("t"))
        // `div` is true integral division (Spark's `/` would widen to
        // double and drift from the oracle's `//` above 2^53)
        .otherwise(expr(s"($budget - s_j) div (n - j)"))
        .cast("long"))
      .select(col(stratumCol), col("stratum_tokens"), col("alloc_tokens"),
        col("epoch_capped"))
  }

  /** Weighted sampling without replacement, k per stratum (Efraimidis &
    * Spirtakis 2006, the exponential-keys form): each row gets priority
    * `-ln(u)/w` — an Exp(w) race, so the k smallest priorities of a
    * stratum are a weight-proportional sample without replacement,
    * exactly equivalent to the classic `u^(1/w)` reservoir keys (the
    * monotone log of the same order). `u` is the portable multiplicative
    * hash of the id mapped to (0, 1], so the sample is reproducible
    * across runs, engines, and cluster sizes — the property
    * `DataFrame.sample` lacks. Non-positive weights are excluded (an
    * Exp(w≤0) race is undefined; such rows could never win honestly).
    *
    * Determinism across engines: the priority is rounded to 9 decimals
    * and the (pri, id) order is total, so the selected set only depends
    * on ln/division agreeing to ~1e-10 relative — far coarser than the
    * 1-ulp worst-case libm spread (the repo's standard rounded-float
    * convention; see p38/p46 for the same reasoning).
    *
    * Scale shape: one stateless projection (hash, ln — all codegen
    * builtins), then the same `row_number ≤ k` window as
    * [[topKPerGroup]] — Catalyst's rank-limit pushdown (SPARK-37099)
    * inserts a PARTIAL WindowGroupLimit below the exchange, so a hot
    * stratum forwards ≤ k rows per input partition, never its corpus
    * share. The corpus itself shuffles once, already cut to candidates.
    */
  def weightedSample(df: DataFrame, stratumCol: String, idCol: String,
                     weight: Column, k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    val m = 1000000007L
    val h = pmod(pmod(col(idCol), lit(m)) * lit(2654435761L), lit(m))
    val u = (h + lit(1L)).cast("double") / lit(m.toDouble) // (0, 1]
    val win = Window.partitionBy(col(stratumCol))
      .orderBy(col("pri").asc, col(idCol).asc)
    df.where(weight > 0)
      .withColumn("pri", round(-log(u) / weight, 9))
      .withColumn("rn", row_number().over(win))
      .where(col("rn") <= k)
      .drop("rn")
  }

  /** Rendezvous (highest-random-weight) shard assignment — the
    * consistent-placement complement to [[deterministicShuffle]]'s mod
    * hashing: each row goes to `argmax over s of mix(id, s)`, so growing
    * the fleet from S to S+1 shards moves only ~1/(S+1) of the keys
    * (mod hashing reshuffles (S−1)/S of them — at 100 TB that is the
    * difference between an incremental top-up and a full rewrite).
    *
    * Pure column expression: the per-row argmax folds over
    * `sequence(0, S−1)` inside whole-stage codegen — NO shuffle, no UDF,
    * no explode. The weight is the repo's portable quadratic mix
    * (mod 1e9+7 integer math, every intermediate < 2.7e18, reproducible
    * bit-for-bit in the DuckDB oracle); ties (≈ S/1e9 likely) break to
    * the larger shard id via the struct max ordering, mirrored in the
    * oracle's ORDER BY. */
  def rendezvousShard(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 100000, s"nShards=$nShards")
    val m = 1000000007L
    val weights = transform(sequence(lit(0), lit(nShards - 1)), s => {
      val a = pmod(
        pmod(col(idCol), lit(m)) * lit(2654435761L) + s * lit(40503L)
          + lit(987654321L), lit(m))
      val b = pmod(a * a + a * lit(1103515245L) + lit(12345L), lit(m))
      struct(b.as("wt"), s.cast("int").as("shard"))
    })
    // one fold per row: project the argmax struct first, then split it —
    // two separate array_max calls would run the S-element fold twice
    df.select(col(idCol).as("doc_id"), array_max(weights).as("best"))
      .select(col("doc_id"),
        col("best").getField("shard").as("shard"),
        col("best").getField("wt").as("weight"))
  }
}
