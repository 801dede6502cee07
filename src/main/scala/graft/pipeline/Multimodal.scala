package graft.pipeline

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads travel as opaque `binary`
  * columns next to a typed metadata struct; decode / feature-extraction /
  * frame-sampling run per-partition so one task amortizes decoder setup
  * over its whole batch. The codecs are REAL pure-JVM decoders — a RIFF/
  * WAVE PCM chunk-walker and PNG via javax.imageio — no external libs.
  *
  * Scale notes (100 TB): payload bytes never shuffle — features are
  * extracted map-side and the binary column is dropped before any wide
  * operation. Partition sizing is the reader's maxPartitionBytes concern,
  * not this operator's. Integer features (sums of squares, pixel sums) are
  * exact, so results are partitioning- and platform-independent.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded per-asset features. Audio rows carry sample_rate; image rows
    * carry width/height; `n_units` is samples or pixels; `sum_feat` is the
    * energy sum (Σ s², audio) or gray-value sum (image); `peak_feat` is
    * the peak |sample| (audio) or the 8×8 nearest-neighbor downsample's
    * pixel sum (image). Integer math end to end — exact at any scale. */
  case class MediaFeatures(doc_id: Long, media_type: String,
                           width: Option[Int], height: Option[Int],
                           sample_rate: Option[Int], n_units: Long,
                           sum_feat: Long, peak_feat: Long)

  // ---- WAV (RIFF/WAVE, PCM16LE mono) --------------------------------------

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }
  private def putShortLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
  }
  private def intLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def shortLE(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)).toShort.toInt

  /** Encode PCM16 mono samples as a standard 44-byte-header WAV file. */
  def encodeWav(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val b = new Array[Byte](44 + dataLen)
    "RIFF".getBytes("US-ASCII").copyToArray(b, 0)
    putIntLE(b, 4, 36 + dataLen)
    "WAVE".getBytes("US-ASCII").copyToArray(b, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(b, 12)
    putIntLE(b, 16, 16) // PCM fmt chunk size
    putShortLE(b, 20, 1) // PCM
    putShortLE(b, 22, 1) // mono
    putIntLE(b, 24, sampleRate)
    putIntLE(b, 28, sampleRate * 2) // byte rate
    putShortLE(b, 32, 2) // block align
    putShortLE(b, 34, 16) // bits
    "data".getBytes("US-ASCII").copyToArray(b, 36)
    putIntLE(b, 40, dataLen)
    var i = 0
    while (i < samples.length) { putShortLE(b, 44 + 2 * i, samples(i)); i += 1 }
    b
  }

  /** Real WAV decode: walk the RIFF chunk list (tolerating extra chunks
    * before `data`), check PCM16 mono, return (sampleRate, samples). */
  def decodeWav(payload: Array[Byte]): (Int, Array[Int]) = {
    require(payload.length >= 44 &&
      new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
      new String(payload, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE file")
    var off = 12
    var sampleRate = -1
    var samples: Array[Int] = null
    while (off + 8 <= payload.length && (sampleRate < 0 || samples == null)) {
      val id = new String(payload, off, 4, "US-ASCII")
      val len = intLE(payload, off + 4)
      id match {
        case "fmt " =>
          require(shortLE(payload, off + 8) == 1, "not PCM")
          require(shortLE(payload, off + 10) == 1, "not mono")
          require(shortLE(payload, off + 22) == 16, "not 16-bit")
          sampleRate = intLE(payload, off + 12)
        case "data" =>
          val n = len / 2
          samples = new Array[Int](n)
          var i = 0
          while (i < n) { samples(i) = shortLE(payload, off + 8 + 2 * i); i += 1 }
        case _ => () // skip unknown chunk
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    (sampleRate, samples)
  }

  // ---- PNG (grayscale, javax.imageio) -------------------------------------

  /** Encode an 8-bit grayscale pixel function as a PNG (lossless). */
  def encodePng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.setUseCache(false) // no temp-file cache inside executor tasks
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real PNG decode via the JDK ImageIO codec; returns the raw gray
    * raster. PNG is lossless, so decoded samples equal the encoded ones. */
  def decodePng(payload: Array[Byte]): BufferedImage = {
    ImageIO.setUseCache(false)
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    img
  }

  // ---- video (GVID: length-prefixed PNG frames) ----------------------------

  /** Encode frames as a minimal real container: "GVID" magic, frame count,
    * fps, then [int32 length][PNG bytes] per frame — the moral equivalent
    * of MJPEG-in-AVI with the container bookkeeping kept honest (magic
    * check, bounds-checked index walk) while each frame uses the real
    * JDK PNG codec. A production deployment swaps the per-frame decoder
    * for an H.264 library; the Spark-side plumbing (binary column,
    * per-partition decode, stride sampling, feature rows out) is
    * identical. */
  def encodeVideo(frames: Seq[Array[Byte]], fps: Int): Array[Byte] = {
    val total = 12 + frames.map(_.length + 4).sum
    val b = new Array[Byte](total)
    "GVID".getBytes("US-ASCII").copyToArray(b, 0)
    putIntLE(b, 4, frames.length)
    putIntLE(b, 8, fps)
    var off = 12
    frames.foreach { f =>
      putIntLE(b, off, f.length)
      f.copyToArray(b, off + 4)
      off += 4 + f.length
    }
    b
  }

  /** Walk the container index: (fps, frame payloads). */
  def decodeVideo(payload: Array[Byte]): (Int, IndexedSeq[Array[Byte]]) = {
    require(payload.length >= 12 &&
      new String(payload, 0, 4, "US-ASCII") == "GVID", "not a GVID container")
    val n = intLE(payload, 4)
    val fps = intLE(payload, 8)
    var off = 12
    val frames = (0 until n).map { _ =>
      require(off + 4 <= payload.length, "truncated frame index")
      val len = intLE(payload, off)
      // compare against the REMAINING length so a crafted 2^31-ish frame
      // length cannot overflow `off + 4 + len` past the check
      require(len >= 0 && len <= payload.length - off - 4, "truncated frame")
      val f = java.util.Arrays.copyOfRange(payload, off + 4, off + 4 + len)
      off += 4 + len
      f
    }
    (fps, frames)
  }

  // ---- deterministic synthesized assets -----------------------------------

  /** Synthesized PCM asset for doc `id`: 8 kHz mono, 200 + id%100 samples,
    * s_i = ((id*31 + i²*7) mod 20001) - 10000 — integer math the oracle
    * reproduces without any codec. */
  def synthWavAsset(id: Long): Array[Byte] = {
    val n = (200 + id % 100).toInt
    val s = Array.tabulate(n)(i => (((id * 31 + i.toLong * i * 7) % 20001) - 10000).toInt)
    encodeWav(s, 8000)
  }

  /** Synthesized grayscale asset for doc `id`: (16 + id%8) × (12 + id%5),
    * pixel(x,y) = (id*7 + x*13 + y*29) mod 256. */
  def synthPngAsset(id: Long): Array[Byte] =
    encodePng((16 + id % 8).toInt, (12 + id % 5).toInt,
      (x, y) => ((id * 7 + x * 13 + y * 29) % 256).toInt)

  /** Synthesized video for doc `id`: (6 + id%5) frames of the PNG pattern
    * with an extra per-frame term, pixel(f,x,y) = (id*7 + f*11 + x*13 +
    * y*29) mod 256 at 4 fps — integer math the oracle reproduces without
    * any codec. */
  def synthVideoAsset(id: Long): Array[Byte] = {
    val (w, h) = ((16 + id % 8).toInt, (12 + id % 5).toInt)
    val frames = (0 until (6 + id % 5).toInt).map(f =>
      encodePng(w, h, (x, y) => ((id * 7 + f * 11 + x * 13 + y * 29) % 256).toInt))
    encodeVideo(frames, fps = 4)
  }

  /** Per-video frame-sampled features: container stats plus, over every
    * `stride`-th frame, the summed gray values and a first-difference
    * motion estimate Σ|sum_k − sum_{k−1}|. */
  case class VideoFeatures(doc_id: Long, n_frames: Int, n_sampled: Int,
                           width: Int, height: Int, sampled_sum: Long,
                           motion: Long)

  /** Frame-sampling + per-frame decode, per-partition like
    * [[extractFeatures]]: the container index walk skips NON-sampled
    * frames without decoding them (the point of stride sampling — a 1%
    * sample pays 1% of the decode), and only the integer feature row
    * leaves the task. */
  def videoFrameFeatures(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.select("doc_id", "media_type", "payload")
      .as[MediaRow]
    ds.mapPartitions { rows =>
      rows.map { r =>
        require(r.media_type == "video/gvid", s"no video decoder for ${r.media_type}")
        val (_, frames) = decodeVideo(r.payload)
        var width = 0; var height = 0
        var total = 0L; var motion = 0L; var prev = -1L; var sampled = 0
        var f = 0
        while (f < frames.length) {
          if (f % stride == 0) {
            val img = decodePng(frames(f))
            val raster = img.getRaster
            width = img.getWidth; height = img.getHeight
            var sum = 0L
            var y = 0
            while (y < height) {
              var x = 0
              while (x < width) { sum += raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            total += sum
            if (prev >= 0L) motion += math.abs(sum - prev)
            prev = sum
            sampled += 1
          }
          f += 1
        }
        VideoFeatures(r.doc_id, frames.length, sampled, width, height, total, motion)
      }
    }.toDF()
  }

  // ---- feature extraction ---------------------------------------------------

  case class DhashRow(doc_id: Long, w: Int, h: Int, dhash: String)

  /** Perceptual difference-hash (dHash) of grayscale PNGs — the standard
    * image near-dup fingerprint: nearest-neighbor downsample to a 9×8
    * grid, one bit per horizontally-adjacent pair (left < right), 64
    * bits emitted as 16 hex chars (row-major bytes, bit x of row y =
    * g[x+1][y] > g[x][y]). Identical images hash identically at any
    * storage encoding (the hash reads decoded PIXELS); small brightness
    * or single-pixel edits flip at most the few bits whose sample grid
    * cells they touch — exact-hash grouping catches re-encodes, Hamming
    * distance over the hash catches near-dups (the p4 SimHash
    * machinery applies unchanged).
    *
    * Scale shape: mapPartitions decode — payloads never shuffle, only
    * (doc_id, w, h, 16-char hash) rows leave the task. */
  /** The 64-bit dHash of one decoded image as 16 hex chars — shared by
    * [[imageDhash]] and the per-frame video fingerprint. */
  private def dhashOf(img: BufferedImage): String = {
    val raster = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    val g = Array.tabulate(9, 8)((x, y) =>
      raster.getSample(x * w / 9, y * h / 8, 0))
    val sb = new StringBuilder
    var y = 0
    while (y < 8) {
      var b = 0
      var x = 0
      while (x < 8) { if (g(x + 1)(y) > g(x)(y)) b |= 1 << x; x += 1 }
      sb.append(f"$b%02x")
      y += 1
    }
    sb.toString
  }

  def imageDhash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          require(r.media_type == "image/png",
            s"imageDhash expects image/png, got ${r.media_type}")
          val img = decodePng(r.payload)
          DhashRow(r.doc_id, img.getWidth, img.getHeight, dhashOf(img))
        }
      }.toDF()
  }

  case class AudioFpRow(doc_id: Long, n_samples: Int, n_windows: Int,
                        fingerprint: String)

  /** Delta-energy audio fingerprint — [[imageDhash]]'s idea on the time
    * axis (the Shazam/chromaprint family reduced to its deterministic
    * core): the decoded samples split into `nWindows` equal windows
    * (remainder to the last), per-window energy Σs², one bit per
    * adjacent pair (energy rises), emitted as hex (nWindows−1 bits,
    * zero-padded to whole bytes, little bit first — bit j of byte b =
    * pair 8b+j). Byte-identical re-encodes fingerprint identically; a
    * localized edit flips only the bits whose windows it touches.
    * Energies are exact integer sums, so the fingerprint is
    * engine/partitioning-invariant and the oracle replays it from the
    * synthesis formula.
    *
    * Scale shape: mapPartitions decode, payloads never shuffle. */
  def audioFingerprint(media: DataFrame, nWindows: Int): DataFrame = {
    require(nWindows >= 2, s"nWindows=$nWindows")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          require(r.media_type == "audio/wav",
            s"audioFingerprint expects audio/wav, got ${r.media_type}")
          val (_, s) = decodeWav(r.payload)
          val n = s.length
          val base = n / nWindows
          require(base >= 1, s"need >= $nWindows samples, got $n")
          val e = new Array[Long](nWindows)
          var w = 0
          while (w < nWindows) {
            val lo = w * base
            val hi = if (w == nWindows - 1) n else (w + 1) * base
            var acc = 0L
            var i = lo
            while (i < hi) { acc += s(i).toLong * s(i); i += 1 }
            e(w) = acc
            w += 1
          }
          val nBits = nWindows - 1
          val sb = new StringBuilder
          var b = 0
          while (b * 8 < nBits) {
            var by = 0
            var j = 0
            while (j < 8 && b * 8 + j < nBits) {
              if (e(b * 8 + j + 1) > e(b * 8 + j)) by |= 1 << j
              j += 1
            }
            sb.append(f"$by%02x")
            b += 1
          }
          AudioFpRow(r.doc_id, n, nWindows, sb.toString)
        }
      }.toDF()
  }

  /** Banded near-dup candidate pairs over [[imageDhash]] hashes — the
    * [[graft.pipeline.Dedup.simhashPairs]] discipline on the image
    * fingerprint: the 64-bit hash splits into 4 bands of 16 bits
    * (4 hex chars), candidates share at least one band, verification is
    * the exact per-byte Hamming distance. Pigeonhole: ≤ 3 flipped bits
    * leave ≥ 1 of 4 bands intact, so recall is GUARANTEED for
    * `maxDist` ≤ 3 (hence the same require as simhashPairs). Never
    * all-pairs: only (doc_id, band) rows join, bounded by band-bucket
    * occupancy. */
  def dhashNearDupPairs(hashes: DataFrame, maxDist: Int): DataFrame =
    bandedHexPairs(hashes, "dhash", nBytes = 8, maxDist = maxDist)

  /** The shared 4-band Hamming blocking over an `nBytes`-byte hex
    * fingerprint column (2·nBytes hex chars): candidates share at least
    * one of 4 equal-width bands, verification is the exact per-byte
    * Hamming distance. Pigeonhole: ≤ 3 flipped bits leave ≥ 1 of 4
    * bands intact, so recall is GUARANTEED for `maxDist` ≤ 3. Never
    * all-pairs: only (doc_id, band) rows join, bounded by band-bucket
    * occupancy. Used by the image ([[dhashNearDupPairs]], 8 bytes) and
    * audio ([[audioNearDupPairs]], 4 bytes) fingerprints. */
  /** Exact per-byte Hamming distance between two hex-string columns of
    * `nBytes` bytes. */
  private def hexHamming(a: org.apache.spark.sql.Column,
                         b: org.apache.spark.sql.Column,
                         nBytes: Int): org.apache.spark.sql.Column =
    (0 until nBytes).map(i =>
      bit_count(conv(substring(a, i * 2 + 1, 2), 16, 10).cast("long")
        .bitwiseXOR(conv(substring(b, i * 2 + 1, 2), 16, 10).cast("long"))))
      .reduce(_ + _)

  /** Member → representative assignment for the exact-equal collapse:
    * one window over the fingerprint assigns each doc the min doc id of
    * its identical-hash group (the round-12 shape shared with the video
    * family — the former groupBy(hash) + join-back shuffled the hex
    * strings twice more, and every member-pair join downstream now
    * compares 8-byte rep ids instead of 2·nBytes-char strings). */
  private def hashReps(hashes: DataFrame, hashCol: String): DataFrame =
    hashes.select(col("doc_id"), col(hashCol).as("hash"))
      .withColumn("rep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("hash")))

  /** Verified near-dup pairs over DISTINCT fingerprints — the banded
    * self-join runs on one row per unique hash (its representative), so
    * an m-item cluster of identical fingerprints occupies each band
    * bucket ONCE instead of m times (the round-11 hot-bucket fix: a
    * corpus-sized cluster of all-black thumbnails no longer makes
    * candidate generation quadratic). Takes (doc_id = rep id, hash) rows,
    * returns (a_id, b_id, hamming) of representative pairs. */
  private def bandedRepPairs(reps: DataFrame,
                             nBytes: Int, maxDist: Int): DataFrame = {
    val bandHex = nBytes / 2 // hex chars per band
    val banded = reps.select(col("doc_id"), col("hash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("b"),
          substring(col("hash"), b * bandHex + 1, bandHex).as("v"))): _*))
        .as("band"))
    // equal ids carry equal hashes, so the hash columns ride through the
    // id-keyed distinct and the Hamming verify needs no join-back
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.hash").as("a_hash"), col("b.hash").as("b_hash"))
      .distinct()
      .withColumn("hamming",
        hexHamming(col("a_hash"), col("b_hash"), nBytes).cast("int"))
      .where(col("hamming") <= maxDist)
      .select("a_id", "b_id", "hamming")
  }

  private def bandedHexPairs(hashes: DataFrame, hashCol: String,
                             nBytes: Int, maxDist: Int): DataFrame = {
    require(maxDist <= 3, "4-band blocking guarantees recall only for dist<=3")
    require(nBytes % 4 == 0, s"nBytes=$nBytes must split into 4 byte bands")
    // several readers below (rep filter, both expansion joins) —
    // persisted here, freed after the eager materialization of the result
    val memb = hashReps(hashes, hashCol).persist()
    val repPairs = bandedRepPairs(
      memb.where(col("doc_id") === col("rep_id")), nBytes, maxDist)
    // within-group pairs (hamming 0) — bounded by the OUTPUT pair list,
    // which is inherently quadratic in cluster size for pair semantics
    val within = memb.as("a").join(memb.as("b"),
        col("a.rep_id") === col("b.rep_id") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        lit(0).as("hamming"))
    // cross-group pairs inherit their representatives' verified distance
    // exactly (equal fingerprints per group)
    val cross = repPairs
      .join(memb.select(col("rep_id").as("a_id"), col("doc_id").as("ma")),
        "a_id")
      .join(memb.select(col("rep_id").as("b_id"), col("doc_id").as("mb")),
        "b_id")
      .select(least(col("ma"), col("mb")).as("a_id"),
        greatest(col("ma"), col("mb")).as("b_id"), col("hamming"))
    // eager materialization so the working set can be freed here instead
    // of accumulating in the session cache across invocations
    val out = within.unionByName(cross).localCheckpoint(true)
    memb.unpersist()
    out
  }

  /** Linear spanning EDGE set for the keep-verdict consumers
    * ([[resolveImageNearDups]]/[[resolveAudioNearDups]]): star edges
    * representative→member inside each exact-equal fingerprint group
    * (O(m) for an m-item identical cluster — never the m²/2 clique the
    * pair list is), plus verified near-dup pairs between DISTINCT
    * fingerprints' representatives. Connected components over these edges
    * equal components over the full pair list: equal-fingerprint members
    * connect through their representative, and any cross-group member
    * pair has exactly its representatives' Hamming distance. */
  private[graft] def bandedHexEdges(hashes: DataFrame, hashCol: String,
                                    nBytes: Int, maxDist: Int): DataFrame = {
    require(maxDist <= 3, "4-band blocking guarantees recall only for dist<=3")
    require(nBytes % 4 == 0, s"nBytes=$nBytes must split into 4 byte bands")
    val memb = hashReps(hashes, hashCol)
    val star = memb.where(col("doc_id") =!= col("rep_id"))
      .select(col("rep_id").as("a_id"), col("doc_id").as("b_id"))
    val repPairs = bandedRepPairs(
        memb.where(col("doc_id") === col("rep_id")), nBytes, maxDist)
      .select("a_id", "b_id")
    star.unionByName(repPairs)
  }

  /** Banded near-dup candidate pairs over [[audioFingerprint]] outputs —
    * the [[dhashNearDupPairs]] machinery on the delta-energy audio
    * fingerprint (which previously only got EXACT-equal grouping): the
    * (nWindows−1)-bit fingerprint splits into 4 byte-aligned bands, so a
    * clip whose perturbation flips ≤ 3 delta bits (a localized edit
    * touches one window → ≤ 2 adjacent bits) is still guaranteed a
    * candidate band. Requires nWindows−1 divisible by 32 so the bands
    * are whole equal bytes. Band-width picks bucket count — the
    * quadratic-occupancy knob at corpus scale: prefer 65 windows
    * (64 bits → 4×16-bit bands, 65k buckets/band — the [[imageDhash]]
    * shape) whenever clips have ≥ 65 samples; 33 (1-byte bands, 256
    * buckets) only for very short clips. */
  def audioNearDupPairs(media: DataFrame, nWindows: Int,
                        maxDist: Int): DataFrame = {
    require((nWindows - 1) % 32 == 0,
      s"nWindows=$nWindows: need (nWindows-1) divisible by 32 for 4 whole-byte bands")
    audioFingerprint(media, nWindows)
      .select(col("doc_id"), col("fingerprint"))
      .transform(bandedHexPairs(_, "fingerprint", (nWindows - 1) / 8, maxDist))
  }

  /** Canonical keep-verdict over image near-dups — the
    * [[graft.pipeline.Dedup.resolveByComponents]] composition applied to
    * [[dhashNearDupPairs]]: near-dup pairs become edges, connected
    * components become duplicate clusters, the minimum doc id is the
    * canonical. Returns (doc_id, cluster_id, keep) for EVERY image —
    * the keep-list a corpus dedup actually consumes, not the pair list.
    * The hash relation (narrow: id + 16 hex chars) persists once: the
    * band self-join reads it twice and the id spine once. */
  def resolveImageNearDups(media: DataFrame, maxDist: Int): DataFrame = {
    val hashes = imageDhash(media).select("doc_id", "dhash").persist()
    // spanning edges, not the pair clique: an m-item identical cluster
    // contributes m−1 star edges (see bandedHexEdges) — the verdict only
    // needs connectivity
    val out = Dedup.resolveByComponents(hashes.select("doc_id"), "doc_id",
        bandedHexEdges(hashes, "dhash", nBytes = 8, maxDist))
      .localCheckpoint(true)
    hashes.unpersist()
    out
  }

  /** [[resolveImageNearDups]] for audio: banded near-dup pairs over the
    * delta-energy fingerprint composed with connected components into the
    * canonical keep-verdict (doc_id, cluster_id, keep) for EVERY clip. */
  def resolveAudioNearDups(media: DataFrame, nWindows: Int,
                           maxDist: Int): DataFrame = {
    require((nWindows - 1) % 32 == 0,
      s"nWindows=$nWindows: need (nWindows-1) divisible by 32 for 4 whole-byte bands")
    val fps = audioFingerprint(media, nWindows)
      .select("doc_id", "fingerprint").persist()
    val out = Dedup.resolveByComponents(fps.select("doc_id"), "doc_id",
        bandedHexEdges(fps, "fingerprint", (nWindows - 1) / 8, maxDist))
      .localCheckpoint(true)
    fps.unpersist()
    out
  }

  case class VideoFpRow(doc_id: Long, n_frames: Int, n_sampled: Int,
                        seq_fp: String)

  /** Perceptual video fingerprint: per-sampled-frame [[dhashOf]] over the
    * GVID index walk (non-sampled frames are index-skipped, never
    * decoded — the [[videoFrameFeatures]] stride discipline), folded
    * ORDER-SENSITIVELY into one sequence fingerprint: md5 over the
    * concatenated frame dHash hex strings in frame order. Two videos
    * match iff their sampled frames are perceptually identical IN THE
    * SAME ORDER — a re-encode (same frames, different container
    * metadata/bytes) fingerprints identically, while a reordered or
    * edited cut does not. Exact grouping on `seq_fp` is the video
    * analogue of [[imageDhash]]-based exact grouping.
    *
    * Scale shape: mapPartitions decode, payloads never shuffle; only
    * (doc_id, counts, 32-char fingerprint) rows leave the task. */
  def videoSeqFingerprint(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { r =>
          require(r.media_type == "video/gvid",
            s"no video decoder for ${r.media_type}")
          val (_, frames) = decodeVideo(r.payload)
          val sb = new StringBuilder
          var sampled = 0
          var f = 0
          while (f < frames.length) {
            if (f % stride == 0) {
              sb.append(dhashOf(decodePng(frames(f))))
              sampled += 1
            }
            f += 1
          }
          md.reset()
          val fp = md.digest(sb.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          VideoFpRow(r.doc_id, frames.length, sampled, fp)
        }
      }.toDF()
  }

  case class ResizeRow(doc_id: Long, src_w: Int, src_h: Int,
                       out_w: Int, out_h: Int, sum_px: Long, px_md5: String)

  /** Nearest-neighbor image RESIZE — the remaining verb of the
    * decode / feature-extract / resize / frame-sample family as its own
    * operator: every image resamples to `outW`×`outH` (source pixel
    * (x·w/outW, y·h/outH), the [[dhashOf]] grid convention), emitting
    * exact integer digests of the RESIZED raster — the pixel sum and an
    * md5 over the row-major comma-joined decimal pixel values (portable:
    * no raw bytes cross an engine boundary). A production pipeline would
    * write the resized payload back to a binary column; the digests are
    * what make the transform oracle-checkable, and the resample itself
    * is the real computation either way.
    *
    * Scale shape: mapPartitions decode+resample — payloads never
    * shuffle, only (doc_id, dims, sum, 32-char digest) rows leave. */
  def resizeFeatures(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, s"outW=$outW outH=$outH")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          require(r.media_type == "image/png",
            s"resizeFeatures expects image/png, got ${r.media_type}")
          val img = decodePng(r.payload)
          val raster = img.getRaster
          val (w, h) = (img.getWidth, img.getHeight)
          val sb = new StringBuilder
          var sum = 0L
          var y = 0
          while (y < outH) {
            var x = 0
            while (x < outW) {
              val v = raster.getSample(x * w / outW, y * h / outH, 0)
              sum += v
              if (sb.nonEmpty) sb.append(',')
              sb.append(v)
              x += 1
            }
            y += 1
          }
          val md = java.security.MessageDigest.getInstance("MD5")
          val digest = md.digest(sb.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          ResizeRow(r.doc_id, w, h, outW, outH, sum, digest)
        }
      }.toDF()
  }

  case class FrameHashRow(doc_id: Long, n_sampled: Int, fidx: Int,
                          fhash: String)

  /** Per-sampled-frame dHash rows — [[videoSeqFingerprint]] WITHOUT the
    * order-sensitive fold, for tolerant frame-level matching. */
  def videoFrameHashes(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive: $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          require(r.media_type == "video/gvid",
            s"no video decoder for ${r.media_type}")
          val (_, frames) = decodeVideo(r.payload)
          val sampled = (0 until frames.length by stride).toArray
          sampled.iterator.zipWithIndex.map { case (f, i) =>
            FrameHashRow(r.doc_id, sampled.length, i,
              dhashOf(decodePng(frames(f))))
          }
        }
      }.toDF()
  }

  /** Tolerant video near-dup pairs — the banded-Hamming discipline at
    * FRAME level, catching what [[videoSeqFingerprint]]'s exact grouping
    * cannot: a re-encode with a few perturbed frames. Per sampled frame,
    * the 64-bit dHash splits into 4 bands keyed by (frame index, band);
    * candidate videos share a band on SOME aligned frame (and have the
    * same sampled-frame count — the alignment contract), then verify by
    * the exact TOTAL Hamming distance summed over all aligned frames,
    * kept at ≤ `maxTotal`. Recall contract: any pair with at least one
    * aligned frame within 3 flipped bits is guaranteed a candidate
    * (pigeonhole per frame) — the typical near-dup, where most frames
    * are untouched, trivially qualifies.
    *
    * Scale shape: only (doc_id, frame, band) keys join — bounded by
    * per-(frame, band) bucket occupancy, never all-pairs; payloads are
    * dropped map-side after the per-partition decode. */
  def videoNearDupPairs(media: DataFrame, stride: Int,
                        maxTotal: Int): DataFrame = {
    require(maxTotal >= 0, s"maxTotal=$maxTotal")
    // read several times (sequence collapse, band explode, both verify
    // sides) — freed after the eager materialization of the result
    val fh = videoFrameHashes(media, stride).persist()
    // exact-equal collapse at VIDEO level (the round-11 hot-bucket fix):
    // videos with identical sampled frame-hash sequences band once via a
    // representative, so a corpus-sized cluster of identical videos (and
    // every (fidx, band) bucket a shared frame would flood) costs O(m)
    // here, not m²/2. One row per video: (doc_id, n_sampled, seq,
    // rep_id = min doc id of its identical-sequence group), the rep
    // assigned by ONE window over the sequence key — the former
    // groupBy(n_sampled, seq) + join-back shuffled the concatenated
    // frame-hash strings twice more, and the within-group self-join
    // below now compares 8-byte rep ids instead of n·16-char strings
    // (guide §2.3/§2.4).
    val srep = fh.groupBy("doc_id", "n_sampled")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("fidx"), col("fhash")))),
        p => p.getField("fhash")), "").as("seq"))
      .withColumn("rep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("n_sampled", "seq")))
      .persist()
    val memb = srep.select(col("doc_id"), col("rep_id"))
    val repFh = fh.join(
      srep.where(col("doc_id") === col("rep_id")).select("doc_id"), "doc_id")
    val banded = repFh.select(col("doc_id"), col("n_sampled"), col("fidx"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("b"),
          substring(col("fhash"), b * 4 + 1, 4).as("v"))): _*)).as("band"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.fidx") === col("b.fidx") && col("a.band") === col("b.band") &&
          col("a.n_sampled") === col("b.n_sampled") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val repPairs = cand
      .join(repFh.select(col("doc_id").as("a_id"), col("fidx"),
        col("fhash").as("a_hash")), Seq("a_id"))
      .join(repFh.select(col("doc_id").as("b_id"), col("fidx"),
        col("fhash").as("b_hash")), Seq("b_id", "fidx"))
      .groupBy("a_id", "b_id")
      .agg(sum(hexHamming(col("a_hash"), col("b_hash"), 8)).cast("int")
        .as("total_hamming"))
      .where(col("total_hamming") <= maxTotal)
    // expansion back to member pairs: within-group pairs are distance 0
    // by construction (same rep ⇔ same (n_sampled, seq) — the group rep
    // is unique per group); cross-group member pairs inherit exactly
    // their representatives' total distance (identical sequences per
    // group)
    val within = memb.as("a").join(memb.as("b"),
        col("a.rep_id") === col("b.rep_id") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        lit(0).as("total_hamming"))
    val cross = repPairs
      .join(memb.select(col("rep_id").as("a_id"), col("doc_id").as("ma")),
        "a_id")
      .join(memb.select(col("rep_id").as("b_id"), col("doc_id").as("mb")),
        "b_id")
      .select(least(col("ma"), col("mb")).as("a_id"),
        greatest(col("ma"), col("mb")).as("b_id"), col("total_hamming"))
    val out = within.unionByName(cross).localCheckpoint(true)
    fh.unpersist(); srep.unpersist()
    out
  }

  /** SHIFT-tolerant video near-dup pairs — what [[videoNearDupPairs]]'s
    * aligned-frame contract (equal sampled count, equal frame indexes)
    * structurally misses: a TRIMMED copy (intro dropped, recap cut) never
    * aligns index-for-index. Candidates come from frame-hash SHINGLES —
    * `shingleK` consecutive per-frame dHashes concatenated, keyed by
    * VALUE only (no frame index), so a copy shifted by any offset still
    * shares every interior shingle; verification finds the best global
    * alignment: for each candidate pair, count exact frame-hash matches
    * at every offset δ = fidx_b − fidx_a, keep the δ with the highest
    * count (ties to the smallest δ), and emit pairs aligning at least
    * `minAligned` frames. Returns (a_id, b_id, best_offset, n_aligned),
    * a_id < b_id, best_offset oriented b-relative-to-a.
    *
    * Use stride 1 (every frame hashed): stride-s sampling breaks shift
    * tolerance for trims that are not multiples of s — the sampled frame
    * sets of copy and source interleave and never hash-match.
    *
    * Scale shape: only (doc_id, 16·shingleK hex chars) rows reach the
    * candidate join and (doc_id, fidx, 16 hex chars) the verify joins —
    * payloads never shuffle. Exact-equal SEQUENCES collapse to one
    * representative before shingling (the [[videoNearDupPairs]]
    * hot-bucket discipline), with both alignment orientations computed
    * rep-level so member expansion stays exact even on tie-broken
    * offsets. */
  def videoShiftNearDupPairs(media: DataFrame, stride: Int, shingleK: Int,
                             minAligned: Int): DataFrame = {
    require(shingleK >= 1, s"shingleK=$shingleK")
    require(minAligned >= 1, s"minAligned=$minAligned")
    val fh = videoFrameHashes(media, stride).persist()
    // rep assigned by ONE window over the sequence key (the
    // videoNearDupPairs round-12 shape): the former groupBy + two
    // join-backs shuffled the concatenated frame-hash strings three
    // times, and the within-group self-join below now compares 8-byte
    // rep ids instead of n·16-char strings
    val srep = fh.groupBy("doc_id", "n_sampled")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("fidx"), col("fhash")))),
        p => p.getField("fhash")), "").as("seq"))
      .withColumn("rep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("n_sampled", "seq")))
      .persist()
    val memb = srep.select(col("doc_id"), col("rep_id"))
    val repFh = fh.join(
      srep.where(col("doc_id") === col("rep_id")).select("doc_id"), "doc_id")
    // shingles sliced straight out of the concatenated rep sequence
    val shingles = srep
      .where(col("doc_id") === col("rep_id") &&
        col("n_sampled") >= shingleK)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), col("n_sampled") - shingleK),
        j => col("seq").substr(j * 16 + 1, lit(16 * shingleK))))
        .as("shingle"))
    val cand = shingles.as("a").join(shingles.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    // per-offset match counts: an equi-join on the frame hash — never a
    // positional cross product
    val counts = cand
      .join(repFh.select(col("doc_id").as("a_id"), col("fidx").as("ai"),
        col("fhash")), "a_id")
      .join(repFh.select(col("doc_id").as("b_id"), col("fidx").as("bi"),
        col("fhash")), Seq("b_id", "fhash"))
      .groupBy(col("a_id"), col("b_id"),
        (col("bi") - col("ai")).as("off"))
      .agg(count(lit(1)).as("n_aligned"))
    // both orientations' argmax (max count; tie min δ for a→b, which is
    // max δ negated for b→a) so member pairs whose id order flips the
    // group orientation still expand to the oracle-exact offset
    val best = counts.groupBy("a_id", "b_id")
      .agg(max(struct(col("n_aligned"), (-col("off")).as("no"))).as("fw"),
        max(struct(col("n_aligned"), col("off").as("po"))).as("rv"))
      .where(col("fw.n_aligned") >= minAligned)
      .select(col("a_id"), col("b_id"),
        (-col("fw.no")).as("off_fwd"), (-col("rv.po")).as("off_rev"),
        col("fw.n_aligned").as("n_aligned"))
    // identical sequences: the best alignment is exactly δ=0 with every
    // frame matched (count(0)=n strictly dominates count(δ≠0) ≤ n−|δ|);
    // same rep ⇔ same (n_sampled, seq), so the pair join runs on 8-byte
    // rep ids with the filters read off the a side
    val wn = srep.select(col("doc_id"), col("n_sampled"), col("rep_id"))
    val within = wn.as("a").join(wn.as("b"),
        col("a.rep_id") === col("b.rep_id") &&
          col("a.doc_id") < col("b.doc_id"))
      .where(col("a.n_sampled") >= shingleK &&
        col("a.n_sampled") >= minAligned)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        lit(0).as("best_offset"),
        col("a.n_sampled").cast("long").as("n_aligned"))
    val cross = best
      .join(memb.select(col("rep_id").as("a_id"), col("doc_id").as("ma")),
        "a_id")
      .join(memb.select(col("rep_id").as("b_id"), col("doc_id").as("mb")),
        "b_id")
      .select(least(col("ma"), col("mb")).as("a_id"),
        greatest(col("ma"), col("mb")).as("b_id"),
        when(col("ma") < col("mb"), col("off_fwd"))
          .otherwise(col("off_rev")).cast("int").as("best_offset"),
        col("n_aligned"))
    val out = within.unionByName(cross).localCheckpoint(true)
    fh.unpersist(); srep.unpersist()
    out
  }

  /** Per-partition decode + feature extraction: the decoders and any codec
    * state initialize once per partition and stream over the batch; only
    * the small integer feature rows leave the task — payloads never
    * shuffle. Dispatch on media_type. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRow] = media.select("doc_id", "media_type", "payload")
      .as[MediaRow]
    ds.mapPartitions { rows =>
      rows.map { r =>
        r.media_type match {
          case "audio/wav" =>
            val (rate, s) = decodeWav(r.payload)
            var sumSq = 0L; var peak = 0L
            var i = 0
            while (i < s.length) {
              val v = s(i).toLong
              sumSq += v * v
              if (math.abs(v) > peak) peak = math.abs(v)
              i += 1
            }
            MediaFeatures(r.doc_id, r.media_type, None, None, Some(rate),
              s.length.toLong, sumSq, peak)
          case "image/png" =>
            val img = decodePng(r.payload)
            val raster = img.getRaster
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            // 8×8 nearest-neighbor thumbnail, then its pixel sum — a
            // deterministic stand-in for learned-embedding pooling
            var ds8 = 0L
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                ds8 += raster.getSample(xx * w / 8, yy * h / 8, 0)
                xx += 1
              }
              yy += 1
            }
            MediaFeatures(r.doc_id, r.media_type, Some(w), Some(h), None,
              w.toLong * h, sum, ds8)
          case other =>
            throw new IllegalArgumentException(s"no decoder for $other")
        }
      }
    }.toDF()
  }
}
