package graft.geo

/** Open Location Code (plus-codes) pair-section codec.
  *
  * The reference keys its whole tile space on 6-char OLC prefixes
  * (reference: openplacereviews-core/src/main/java/org/openplacereviews/osm/parser/OsmLocationTool.java:16,26-33)
  * and rolls summaries up to 4-char prefixes
  * (reference: openplacereviews-core/src/main/java/org/openplacereviews/api/OprSummaryPlaceDataProvider.java:24,36).
  * Implemented from the public OLC spec (pair sections only — all code
  * lengths we need are even and <= 10, so no grid refinement is required).
  */
object Olc {
  val Alphabet = "23456789CFGHJMPQRVWX"
  private val Base = Alphabet.length // 20

  private def clipLat(lat: Double): Double =
    math.min(math.max(lat, -90.0), 90.0)

  private def normLon(lon: Double): Double = {
    var l = lon
    while (l < -180.0) l += 360.0
    while (l >= 180.0) l -= 360.0
    l
  }

  /** Encode to an even-length pair-section code (2..10 chars, no '+'). */
  def encode(lat: Double, lon: Double, codeLength: Int = 6): String = {
    require(codeLength >= 2 && codeLength <= 10 && codeLength % 2 == 0,
      s"pair-section code length must be even and in [2,10], got $codeLength")
    var latVal = clipLat(lat) + 90.0
    var lonVal = normLon(lon) + 180.0
    val sb = new java.lang.StringBuilder(codeLength)
    var res = 20.0
    var i = 0
    while (i < codeLength / 2) {
      // min() guards the lat==90 / lon→180 upper edge.
      val latD = math.min(math.floor(latVal / res).toInt, Base - 1)
      val lonD = math.min(math.floor(lonVal / res).toInt, Base - 1)
      sb.append(Alphabet.charAt(latD))
      sb.append(Alphabet.charAt(lonD))
      latVal -= latD * res
      lonVal -= lonD * res
      res /= Base
      i += 1
    }
    sb.toString
  }

  /** Encode with the longitude first wrapped by the exact modulo arithmetic
    * the SQL/column formulations use: `((lon+180)%360+360)%360-180`. For
    * in-range lon this is the identity VALUE but not the identity DOUBLE —
    * fmod can perturb the ulp, which flips a trailing digit when the input
    * sits on a cell boundary. Engine-side callers (and the DuckDB oracle)
    * agree on this formulation, so tile ids stay bit-identical everywhere. */
  def encodeWrapped(lat: Double, lon: Double, codeLength: Int): String = {
    val lonW = ((lon + 180.0) % 360.0 + 360.0) % 360.0 - 180.0
    encode(lat, lonW, codeLength)
  }

  /** Decode a pair-section code to the (south, west, height, width) cell. */
  def decodeArea(code: String): (Double, Double, Double, Double) = {
    var latLo = -90.0
    var lonLo = -180.0
    var res = 20.0
    var i = 0
    while (i + 1 < code.length) {
      latLo += Alphabet.indexOf(code.charAt(i).toUpper) * res
      lonLo += Alphabet.indexOf(code.charAt(i + 1).toUpper) * res
      res /= Base
      i += 2
    }
    val size = res * Base
    (latLo, lonLo, size, size)
  }

  /** Center of the cell a pair-section code denotes (lat, lon).
    * Matches the reference's pad-then-decode-center behavior
    * (OsmLocationTool.java:35-55). */
  def decodeCenter(code: String): (Double, Double) = {
    val (latLo, lonLo, h, w) = decodeArea(code)
    (latLo + h / 2.0, lonLo + w / 2.0)
  }

  /** The 8 neighbor codes of a cell (same code length), for tile-bucketed
    * distance joins that must see across cell borders. */
  def neighbors(code: String): Seq[String] = {
    val (latLo, lonLo, h, w) = decodeArea(code)
    val cLat = latLo + h / 2.0
    val cLon = lonLo + w / 2.0
    for {
      dy <- Seq(-1, 0, 1)
      dx <- Seq(-1, 0, 1)
      if dy != 0 || dx != 0
      lat = cLat + dy * h
      lon = cLon + dx * w
      if lat > -90.0 && lat < 90.0
    } yield encode(lat, lon, code.length)
  }
}
