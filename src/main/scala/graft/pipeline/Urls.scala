package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + exact URL-level dedup — the first step of every
  * web-corpus pipeline (CCNet, C4, RefinedWeb all dedup on a normalized
  * URL before touching content): byte-different spellings of the same
  * resource must collapse to one key or the content-level dedup pays for
  * millions of trivial pairs.
  *
  * Normalization rules (the conservative, semantics-preserving subset of
  * RFC 3986 §6 plus the universal tracking-param scrub):
  *   - strip the fragment (`#…` — never sent to the server);
  *   - lowercase scheme and host (case-insensitive by RFC);
  *   - strip a leading `www.` from the host;
  *   - drop the default port (`:443` for https, `:80` for http);
  *   - drop `utm_*` tracking query parameters; drop the `?` if the query
  *     emptied;
  *   - collapse a trailing-slash run on the path; an empty path
  *     canonicalizes to `/`.
  * Path case and non-tracking query params are PRESERVED (paths are
  * case-sensitive by RFC; dropping real params would merge distinct
  * resources).
  *
  * Implementation is pure builtin string functions (`split_part`,
  * `substring`, `rtrim`, array HOFs) — whole-stage-codegen'd, no regexp
  * and no UDF on the hot path, and every function has an identically-
  * behaving DuckDB twin so the oracle reproduces the canon key
  * byte-for-byte.
  *
  * Scale shape (100 TB): canonicalization is stateless map-side work; the
  * dedup flag is ONE shuffle keyed by the canon string (the minimal
  * correct amount — first-occurrence-wins is a global decision). Rank-
  * limit pushdown does not apply (every row is kept, only flagged), but
  * the per-key window state is O(1).
  */
object Urls {

  /** The canonical form of `url`, or null when `url` has no `://`
    * (not an absolute URL — callers route those to a quarantine). */
  def canonicalUrl(url: Column): Column = {
    val noFrag = split_part(url, lit("#"), lit(1))
    val schemeRaw = split_part(noFrag, lit("://"), lit(1))
    val scheme = lower(schemeRaw)
    val rest = substring(noFrag, length(schemeRaw) + 4, lit(Int.MaxValue))
    val hp = split_part(split_part(rest, lit("/"), lit(1)), lit("?"), lit(1))
    val pathq = substring(rest, length(hp) + 1, lit(Int.MaxValue))
    val host0 = lower(split_part(hp, lit(":"), lit(1)))
    val host = when(startswith(host0, lit("www.")),
      substring(host0, lit(5), lit(Int.MaxValue))).otherwise(host0)
    val port = split_part(hp, lit(":"), lit(2))
    val keepPort = port =!= "" &&
      !(scheme === "https" && port === "443") &&
      !(scheme === "http" && port === "80")
    val path = split_part(pathq, lit("?"), lit(1))
    val query = split_part(pathq, lit("?"), lit(2))
    val cleanQuery = array_join(
      filter(split(query, "&"),
        x => x =!= "" && !startswith(x, lit("utm_"))), "&")
    val trimmedPath = rtrim(path, "/")
    val canonPath = when(trimmedPath === "", lit("/")).otherwise(trimmedPath)
    when(noFrag.contains("://") && schemeRaw =!= "" && host =!= "",
      concat(scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        canonPath,
        when(cleanQuery =!= "", concat(lit("?"), cleanQuery)).otherwise(lit(""))))
  }

  /** Canonicalize + first-occurrence-wins dedup flag. Output:
    * (idCol, host, canon_url, is_dup) — `is_dup` marks every row whose
    * canon key was already claimed by a smaller id. */
  def dedupByCanonical(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val canon = df.select(col(idCol),
      canonicalUrl(col(urlCol)).as("canon_url"))
    val host = split_part(
      split_part(canon.col("canon_url"), lit("://"), lit(2)),
      lit("/"), lit(1))
    canon
      .withColumn("host", split_part(host, lit(":"), lit(1)))
      .withColumn("is_dup",
        (row_number().over(Window.partitionBy(col("canon_url"))
          .orderBy(col(idCol))) > 1).cast("int"))
      .select(col(idCol), col("host"), col("canon_url"), col("is_dup"))
  }
}
