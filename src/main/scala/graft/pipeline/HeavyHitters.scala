package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT frequent items in two passes with no full-vocabulary shuffle —
  * the heavy-hitters member of the sketch family (x1 HLL distinct, x2
  * quantile sketch):
  *
  *  1. a Misra-Gries(k) summary runs per partition (`mapPartitions`,
  *     at most k−1 counters each). Pigeonhole over the per-partition
  *     guarantee makes the UNION of candidates a superset of every item
  *     with global count > N/k: if an item stayed under n_p/k in every
  *     partition, its total stays under N/k.
  *  2. the bounded candidate set (≤ partitions·(k−1) items) broadcasts
  *     back and ONLY candidates are exact-counted, then filtered by the
  *     true integer threshold `cnt·k > N`.
  *
  * The output is exact and deterministic: the sketch's merge-order
  * nondeterminism only changes which false candidates pass 2 disproves.
  * At 100 TB the only shuffle is the candidate-count hash-agg over rows
  * whose items survived the broadcast semi-join.
  */
object HeavyHitters {

  /** Items (as strings) of `itemCol` with global count strictly greater
    * than N/k, with their exact counts: (item, cnt), ordered by item.
    *
    * Genuinely two scans: pass 1 emits ONE bounded summary row per
    * partition — (MG candidates, partition row count) — collected like
    * the IVF centroid pull, so N needs no separate count() job; pass 2
    * is the candidate recount.
    *
    * REQUIRES a deterministic input: `df` is evaluated twice (summaries,
    * then recount), and the exactness proof assumes both scans see the
    * same rows — a `sample()` without a seed, a `rand()` filter, or a
    * source whose files change between the scans silently voids the
    * superset guarantee (pass 1's N and pass 2's counts would describe
    * different datasets). Callers with such an input must materialize it
    * first (`localCheckpoint()`); the operator does not do so itself
    * because checkpointing the full item relation at 100 TB is the wrong
    * default for the overwhelmingly common deterministic-scan case. */
  def frequentItems(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k > 1, s"k must exceed 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    val summaries = items.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap[String, Long]()
      var localN = 0L
      it.foreach { x =>
        localN += 1
        if (counters.contains(x)) counters(x) += 1
        else if (counters.size < k - 1) counters(x) = 1
        else {
          // decrement-all step; drop zeroed counters
          val dead = Seq.newBuilder[String]
          counters.keysIterator.foreach { key =>
            val c = counters(key) - 1
            if (c == 0) dead += key else counters(key) = c
          }
          dead.result().foreach(counters.remove)
        }
      }
      Iterator.single((counters.keys.toSeq, localN))
    }.collect()
    val n = summaries.map(_._2).sum
    val cand = summaries.flatMap(_._1).distinct.toSeq.toDF("item")
    items.join(broadcast(cand), "item")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * k > n)
      .orderBy("item")
  }
}
