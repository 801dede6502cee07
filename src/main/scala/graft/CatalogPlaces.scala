package graft

/** Place-engine surface queries (geoTile / summary / history / merge / ops
  * algebra) — populated as the engine modules land. */
object CatalogPlaces {
  val entries: Seq[Q] = Seq()
}
