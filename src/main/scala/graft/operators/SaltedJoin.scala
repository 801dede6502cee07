package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew-salted equi-join: identical results to the plain join,
  * but the shuffle key is (join keys, salt) so a pathological hot key
  * spreads over `salts` reducer tasks instead of pinning one straggler.
  *
  * Mechanics: every probe-side row gets a deterministic salt from the
  * hash of its full row (a hot KEY's many distinct rows fan out evenly;
  * identical duplicate rows share a salt, which is correct — they carry
  * identical join work), and the build side is replicated `salts`× with
  * one copy per salt value, so each (probe, build) pair matches on
  * exactly one salt. Replication costs `salts × |build|` shuffled rows —
  * use when the build side is far smaller than the probe side but above
  * the broadcast threshold, the regime where AQE's skew-join split
  * (which only rebalances sort-merge partitions AFTER a skewed exchange
  * materializes) or a plain broadcast can't help.
  *
  * 100 TB shape: the probe side shuffles once on (keys, salt) — same
  * volume as the plain join, better balance; no row ever concentrates
  * more than 1/salts of a hot key's work on one task.
  */
object SaltedJoin {

  private val SaltCol = "__salt"

  /** Inner equi-join of `probe` and `build` on `keys`, salted `salts`
    * ways. Column order matches `probe.join(build, keys)`. */
  def inner(probe: DataFrame, build: DataFrame, keys: Seq[String],
            salts: Int): DataFrame = {
    require(salts >= 1 && salts <= 4096, s"salts=$salts out of range")
    require(keys.nonEmpty, "at least one join key required")
    // silent mis-resolution is worse than an error (the AsofJoin lesson)
    Seq(probe, build).foreach(df => require(!df.columns.contains(SaltCol),
      s"input must not contain reserved column $SaltCol"))
    val salted = probe.withColumn(SaltCol,
      pmod(hash(probe.columns.map(col).toSeq: _*), lit(salts)))
    val replicated = build.withColumn(SaltCol,
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, keys :+ SaltCol).drop(SaltCol)
  }
}
