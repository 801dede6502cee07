package graft

/** Training-data pipeline operators (dedup / similarity / multimodal / text
  * analysis) — populated as the pipeline modules land. */
object CatalogPipeline {
  val entries: Seq[Q] = Seq()
}
