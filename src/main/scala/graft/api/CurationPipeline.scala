package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, TextAnalysis}

/** End-to-end corpus curation: composes the `graft.pipeline` operators in
  * the order a production pretraining-data pipeline applies them, as ONE
  * DataFrame program per document set. The individual operators each have
  * their own oracle-checked catalog query; this facade is the "a user of
  * the engine runs the whole funnel" surface, the corpus-side analogue of
  * [[PlacesEngine]] for the places side.
  *
  * Funnel order (first failing stage names the drop reason — the standard
  * ordering: dedup before expensive signals so duplicates don't pay for
  * scoring, contamination before quality so eval leakage is never
  * explained away as "low quality"):
  *
  *   1. exact dedup       — md5 groups, non-canonical members drop
  *                          ([[Dedup.exactDuplicates]])
  *   2. near-dup resolve  — MinHash+LSH pairs → connected components →
  *                          per-cluster canonical keep
  *                          ([[Dedup.minhashLshPairs]],
  *                          [[Dedup.resolveByComponents]])
  *   3. decontamination   — n-gram overlap against the benchmark set
  *                          ([[Dedup.contaminationFlags]])
  *   4. language filter   — n-gram-heuristic language ID
  *                          ([[TextAnalysis.langId]])
  *   5. quality filter    — composite quality score
  *                          ([[TextAnalysis.qualityFeatures]])
  *
  * When document embeddings exist, [[graft.pipeline.Similarity.semanticDedup]]
  * slots in as a further dedup stage after step 2 (SemDeDup's published
  * placement: semantic duplicates survive both the exact and the n-gram
  * stages because paraphrases share no shingles).
  *
  * Scale shape (100 TB): every signal is computed map-side from the text
  * and then joined back by `doc_id` — the joins shuffle (doc_id, signal)
  * rows, never text. The dedup stages inherit their operators' shapes
  * (hash-only shuffles, band-key joins, broadcast benchmark grams). The
  * near-dup keep-list and exact-dup membership are the only shuffled
  * artifacts proportional to the duplicated subset. Downstream, `keep`
  * survivors flow to [[graft.pipeline.Sampling.stratifiedBalance]] /
  * [[graft.pipeline.Sampling.packSequences]] keyed on the emitted
  * `lang` / `n_tokens` columns.
  */
object CurationPipeline {

  /** Funnel thresholds. Defaults mirror the catalog queries' parameters.
    *
    * @param ngram        shingle width for near-dup signatures
    * @param numHashes    MinHash signature length (bands = numHashes/bandRows)
    * @param bandRows     rows per LSH band
    * @param minSim       exact-Jaccard verify threshold for near-dup pairs
    * @param decontamNgram benchmark-overlap gram width
    * @param maxContamFrac contaminated-fraction threshold (≥ drops)
    * @param lang         required language id, or null to keep all
    * @param minQuality   minimum composite quality score
    */
  final case class Config(
      ngram: Int = 2,
      numHashes: Int = 32,
      bandRows: Int = 4,
      minSim: Double = 0.8,
      decontamNgram: Int = 3,
      maxContamFrac: Double = 0.5,
      lang: String = "en",
      minQuality: Double = 0.3)

  /** Per-document curation verdict over `corpus(idCol, textCol)`:
    * every signal that fed the decision (cluster id, contaminated
    * fraction, lang, quality score, token count), `drop_reason` = the
    * FIRST failing stage in funnel order (null when kept), and
    * `keep = drop_reason IS NULL`. One row per input document. */
  def curate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
             textCol: String, cfg: Config = Config()): DataFrame = {
    val base = corpus.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // benchmark must share the normalized (doc_id, text) shape — its idCol/
    // textCol are read with the same names as the corpus's
    val bench = benchmark.select(col(idCol).as("doc_id"), col(textCol).as("text"))

    // Stage outputs below are EAGERLY materialized (cache + count), not
    // lazily cached: AQE runs the downstream consumers' exchange jobs
    // concurrently (CompletableFuture), and concurrent first-readers of a
    // lazy cache STAMPEDE — each recomputes the full lineage before any
    // partition lands (the round-6 p17 shingle-cache lesson; measured
    // here: exactKept's corpus-wide build executed 3x, exactDrop's md5
    // window 2x, ~25 s of duplicated CPU per funnel run).
    // Plan-only consumers (Explain, PlanAuditSpec) opt out via the session
    // conf below — they build the frame purely to inspect its plan and
    // must not pay the funnel's execution at construction time. The lazy
    // fallback still marks the cache so an opted-out frame that IS later
    // executed remains correct (it merely risks the stampede recompute).
    val materialize = corpus.sparkSession.conf
      .get("graft.curation.eagerStages", "true").toBoolean
    def eager(df: DataFrame): DataFrame =
      { val c = df.cache(); if (materialize) c.count(); c }

    // 1. exact duplicates: only non-canonical members of >1 groups
    val exactDrop = eager(Dedup.exactDuplicates(base, "doc_id", "text")
      .where(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id"), lit(true).as("exact_dup")))

    // 2. near-dup clusters over the exact-canonical survivors (running it
    // on the full set would re-find every exact group as a near cluster).
    // Both id-frames are referenced twice below (survivor filter + final
    // assembly); they carry ids and flags only — never text — so caching
    // them is bounded by the dup subset, not the corpus.
    // exactKept feeds three consumers (pair generation, the CC node
    // universe, the survivor filter) — cache it like `survivors` below:
    // both are the materialized stage outputs a production funnel
    // checkpoints anyway
    val exactKept = eager(base.join(exactDrop, Seq("doc_id"), "left_anti"))
    val resolved = Dedup.resolveByComponents(exactKept, "doc_id",
        Dedup.minhashLshPairs(exactKept, "doc_id", "text",
          cfg.ngram, cfg.numHashes, cfg.bandRows, cfg.minSim)
          .select(col("a_id"), col("b_id")))
      .select(col("doc_id"), col("cluster_id"), col("keep").as("near_keep"))
      .cache()

    // 3-5. map-side signals — over the stage-1/2 SURVIVORS only: at a
    // realistic 30-50% dup rate, scoring the full corpus would pay
    // 1.5-2x for documents already dropped. Dropped rows surface NULL
    // signals (their drop_reason is decided before these stages run).
    // The survivor corpus feeds three signal passes; cache it — this is
    // the in-session stand-in for the materialization a production run
    // does anyway (the dedup output IS the pipeline's checkpoint artifact).
    val survivors = eager(exactKept.join(
        resolved.where(col("near_keep")).select("doc_id"), Seq("doc_id"), "left_semi"))
    val contam = Dedup.contaminationFlags(survivors, bench, "doc_id", "text",
        cfg.decontamNgram, cfg.maxContamFrac)
      .select(col("doc_id"), col("contaminated_frac"),
        col("flagged").as("contaminated"))
    // lang / token-count / quality are all map-side expressions — ONE
    // projection pass over the survivor cache, one join back
    val signals = survivors.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang"),
      TextAnalysis.bpeishTokenCount(col("text")).as("n_tokens"),
      TextAnalysis.qualityScore(col("text")).as("quality_score"))

    base.select("doc_id")
      .join(exactDrop, Seq("doc_id"), "left")
      .join(resolved, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .join(signals, Seq("doc_id"), "left")
      .withColumn("drop_reason",
        when(coalesce(col("exact_dup"), lit(false)), "exact_duplicate")
          .when(!coalesce(col("near_keep"), lit(true)), "near_duplicate")
          .when(coalesce(col("contaminated"), lit(false)), "contaminated")
          .when(Option(cfg.lang).map(col("lang") =!= _).getOrElse(lit(false)),
            "wrong_language")
          .when(col("quality_score") < cfg.minQuality, "low_quality"))
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        col("contaminated_frac"),
        col("lang"), col("n_tokens"), col("quality_score"),
        col("drop_reason"), col("drop_reason").isNull.as("keep"))
  }
}
