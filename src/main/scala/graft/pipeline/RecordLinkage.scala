package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (JASA 1969) — the
  * classical match/non-match log-odds score every serious dedup system
  * (Splink, dedupe.io, census linkage) runs over its blocking
  * candidates: each field contributes ln(m/u) when the pair AGREES on it
  * and ln((1−m)/(1−u)) when it disagrees, where m = P(agree | match)
  * and u = P(agree | random pair). Pairs score above 0 when their
  * agreement pattern is likelier under "same entity" than chance.
  *
  * u-probabilities are ESTIMATED FROM THE CORPUS exactly:
  * u_f = Σ_v c_v(c_v−1) / (n(n−1)) — the probability two random records
  * share a value — via one count-by-value aggregate per field (map-side
  * combinable; the value histogram never leaves the executors, only the
  * Σc² scalar does). m is the caller's prior (fields of a true duplicate
  * agree with probability ~0.95; an EM fit is out of scope and rarely
  * changes decisions at corpus scale).
  *
  * Scale shape: u estimation is one aggregate pass per field over the
  * corpus (a handful of scalars to the driver — a bounded artifact, like
  * quantizer ranges); scoring joins only the CANDIDATE pairs (from
  * [[Dedup.sortedNeighborhood]] / LSH blocking) back to the field
  * projection by id — the corpus never self-joins. The per-pair score is
  * a FIXED-ORDER sum of four doubles (field list order), so both engines
  * compute bit-identical log-odds.
  */
object RecordLinkage {

  /** Score candidate `pairs` (a_id, b_id) over `fields` of `df`.
    * Emits (a_id, b_id, n_agree, score, is_match = score > 0). */
  def fellegiSunter(df: DataFrame, idCol: String, fields: Seq[String],
                    pairs: DataFrame, m: Double = 0.95): DataFrame = {
    require(fields.nonEmpty && m > 0 && m < 1, s"fields=$fields m=$m")
    val n = df.count()
    require(n >= 2, "need at least two records to estimate u")
    // u_f = Σ_v c_v² − n over n² − n, exact integer sums → one double
    // division (identical expression shape in the oracle). ALL fields'
    // value histograms come from ONE corpus scan (fields explode to
    // (field, value) rows, map-side combinable) — a per-field groupBy
    // would rescan a 100 TB corpus once per field. String-casting the
    // exploded values is count-preserving (the cast is injective per
    // field), so Σc² is unchanged; the AGREEMENT compare below still
    // runs on the raw typed columns.
    val fv = df.select(explode(array(fields.map(f =>
        struct(lit(f).as("f"), col(f).cast("string").as("v"))): _*)).as("x"))
      .select(col("x.f").as("f"), col("x.v").as("v"))
    val sumsq = fv.groupBy("f", "v").agg(count(lit(1)).as("c"))
      .groupBy("f").agg(sum(col("c") * col("c")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = fields.map { f =>
      val u = (sumsq(f).toDouble - n) / (n.toDouble * n - n)
      require(u > 0 && u < 1, s"field $f is degenerate (u=$u): all-equal " +
        "or all-distinct fields carry no linkage signal")
      f -> (math.log(m / u), math.log((1 - m) / (1 - u)))
    }
    val a = df.select(col(idCol).as("a_id") +:
      fields.map(f => col(f).as(s"a_$f")): _*)
    val b = df.select(col(idCol).as("b_id") +:
      fields.map(f => col(f).as(s"b_$f")): _*)
    val joined = pairs.select("a_id", "b_id").join(a, "a_id").join(b, "b_id")
    val agrees = weights.map { case (f, _) =>
      col(s"a_$f") <=> col(s"b_$f")
    }
    val score = weights.zip(agrees).map { case ((_, (wa, wd)), ag) =>
      when(ag, lit(wa)).otherwise(lit(wd))
    }.reduce(_ + _)
    val nAgree = agrees.map(ag => when(ag, 1).otherwise(0)).reduce(_ + _)
    joined.select(col("a_id"), col("b_id"),
      nAgree.cast("int").as("n_agree"),
      round(score, 6).as("score"),
      (round(score, 6) > 0).as("is_match"))
  }
}
