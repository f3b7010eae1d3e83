package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-media metadata + features row. `format` is `grf1/gray` or
  * `grf1/rgb` for a successful decode, `corrupt/<reason>` for a payload
  * that failed parsing (quarantined as data — the PERMISSIVE posture
  * `CorpusIO.readJsonl` uses — never an exception that kills the job).
  */
case class MediaMeta(doc_id: Long, width: Int, height: Int, channels: Int,
    format: String, n_bytes: Long, mean_luma: Double)

/** Multimodal media pipeline (SURVEY §2i): images/audio/video ride Spark
  * as opaque binary columns; decode / feature-extract runs batched per
  * partition via mapPartitions.
  *
  * The codec is a REAL parser of a declared synthetic container format
  * (r12 — previously a stub that invented dimensions from two payload
  * bytes). This container has no image/audio libraries, so the format is
  * our own, but the decode path does everything a real one does: magic
  * validation, big-endian header parse, structural bounds checks
  * (dims/channels/length), a per-pixel feature pass over the actual
  * payload bytes (mean luminance), and malformed-payload quarantine.
  * Swapping in libjpeg is a one-function change; nothing about the
  * plumbing or the error contract moves.
  *
  * '''GRF1 container layout''' (big-endian):
  * {{{
  *   bytes 0-3   magic "GRF1"
  *   bytes 4-5   width  (u16, >= 1)
  *   bytes 6-7   height (u16, >= 1)
  *   byte  8     channels (u8: 1 = gray, 3 = rgb)
  *   bytes 9..   pixel bytes, exactly width*height*channels
  * }}}
  *
  * Scale notes: mapPartitions keeps the (large) payloads local — no
  * shuffle; batching amortizes per-call codec setup exactly like a Pandas
  * UDF batch would; output is a narrow typed Dataset that downstream
  * queries can aggregate without touching payload bytes again.
  */
object MediaPipeline {

  val BatchSize = 32
  val HeaderBytes = 9
  private val Magic = "GRF1".getBytes("US-ASCII")

  /** Deterministic GRF1 writer for one document: dimensions and channel
    * count derive from the content digest (stable across runs, engines,
    * partitionings — the etl_stratified_sample posture), pixel bytes are
    * the content cycled to fill the raster. The synthetic stand-in for
    * the crawler that stores real media next to text.
    */
  private[multimodal] def encodeOne(seed: Array[Byte]): Array[Byte] = {
    val dig = java.security.MessageDigest.getInstance("MD5").digest(seed)
    val w = 16 + ((dig(0) & 0xff) % 48)
    val h = 16 + ((dig(1) & 0xff) % 48)
    val c = if ((dig(2) & 1) == 0) 1 else 3
    val n = w * h * c
    val out = new Array[Byte](HeaderBytes + n)
    System.arraycopy(Magic, 0, out, 0, 4)
    out(4) = (w >> 8).toByte; out(5) = w.toByte
    out(6) = (h >> 8).toByte; out(7) = h.toByte
    out(8) = c.toByte
    var i = 0
    while (i < n) {
      out(HeaderBytes + i) = if (seed.nonEmpty) seed(i % seed.length) else 0
      i += 1
    }
    out
  }

  /** Attach a GRF1 binary payload column to documents (doc_id, payload) —
    * a narrow typed map, payloads born in-partition.
    */
  def withPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => (id, encodeOne(t.getBytes("UTF-8"))) }
      .toDF("doc_id", "payload")
  }

  /** REAL codec for one GRF1 payload: validate magic, parse the
    * big-endian header, check structural consistency, and run the
    * feature pass (mean luminance) over the actual pixel bytes.
    * Malformed payloads decode to a `corrupt/<reason>` row instead of
    * throwing — one bad crawl artifact must cost one row, not the batch.
    */
  private[multimodal] def decodeOne(docId: Long, payload: Array[Byte]): MediaMeta = {
    def corrupt(reason: String) =
      MediaMeta(docId, 0, 0, 0, s"corrupt/$reason", payload.length.toLong, 0.0)
    if (payload.length < HeaderBytes) corrupt("truncated_header")
    else if (payload(0) != Magic(0) || payload(1) != Magic(1) ||
      payload(2) != Magic(2) || payload(3) != Magic(3)) corrupt("bad_magic")
    else {
      val w = ((payload(4) & 0xff) << 8) | (payload(5) & 0xff)
      val h = ((payload(6) & 0xff) << 8) | (payload(7) & 0xff)
      val c = payload(8) & 0xff
      if (w == 0 || h == 0 || (c != 1 && c != 3)) corrupt("bad_dims")
      else if (payload.length != HeaderBytes + w * h * c) corrupt("length_mismatch")
      else {
        val n = w * h * c
        var sum = 0L
        var i = 0
        while (i < n) { sum += payload(HeaderBytes + i) & 0xff; i += 1 }
        MediaMeta(docId, w, h, c, if (c == 1) "grf1/gray" else "grf1/rgb",
          payload.length.toLong, sum.toDouble / n)
      }
    }
  }

  /** Nearest-neighbor downscale of one GRF1 payload so that
    * max(width, height) ≤ `maxDim`, re-encoded as a VALID GRF1 container
    * (updated header, exact-length raster) — the media-normalization
    * step a multimodal training pipeline runs before feature extraction
    * (bounding decode cost and memory per sample). Real pixel math over
    * real payload bytes: output pixel (y, x, c) is the source pixel at
    * the floor-mapped coordinate, per channel. Payloads already inside
    * the bound pass through UNCHANGED (byte-identical — no pointless
    * re-encode); malformed payloads pass through unchanged too, so the
    * downstream [[decodeOne]] still quarantines them with the original
    * reason (resize never launders a corrupt sample into a crash or a
    * fake image).
    */
  private[multimodal] def resizeOne(payload: Array[Byte], maxDim: Int): Array[Byte] = {
    val meta = decodeOne(0L, payload)
    if (meta.format.startsWith("corrupt/")) payload
    else if (meta.width <= maxDim && meta.height <= maxDim) payload
    else {
      val (w, h, c) = (meta.width, meta.height, meta.channels)
      val scale = math.max(w, h).toDouble / maxDim
      val nw = math.max(1, math.round(w / scale).toInt)
      val nh = math.max(1, math.round(h / scale).toInt)
      val out = new Array[Byte](HeaderBytes + nw * nh * c)
      System.arraycopy(Magic, 0, out, 0, 4)
      out(4) = (nw >> 8).toByte; out(5) = nw.toByte
      out(6) = (nh >> 8).toByte; out(7) = nh.toByte
      out(8) = c.toByte
      var y = 0
      while (y < nh) {
        val sy = math.min(h - 1, (y * scale).toInt)
        var x = 0
        while (x < nw) {
          val sx = math.min(w - 1, (x * scale).toInt)
          var ch = 0
          while (ch < c) {
            out(HeaderBytes + (y * nw + x) * c + ch) =
              payload(HeaderBytes + (sy * w + sx) * c + ch)
            ch += 1
          }
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Batched partition-local resize over (doc_id, payload) — same
    * mapPartitions shape as [[decode]]: payloads never leave their
    * partition, batches amortize codec setup, and the output schema is
    * the input schema so resize composes anywhere in the payload
    * pipeline (withPayload → resize → decode).
    */
  def resize(withPayloadDf: DataFrame, maxDim: Int): DataFrame = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, p) => (id, resizeOne(p, maxDim)) }
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Perceptual-hash grid geometry: [[DhashRows]]×[[DhashCols]] samples,
    * ([[DhashCols]]−1) gradient bits per row → 4 rows × 15 bits = a
    * 60-bit dHash. 60 bits (not the textbook 64) is deliberate: the
    * signature stays positive in a signed BIGINT in both engines, and
    * the 4×15 layout reuses `dd_simhash`'s pigeonhole banding verbatim
    * (one band per grid row, Hamming ≤ 3 flips leave ≥ 1 band intact,
    * 32,768 keys per band).
    */
  val DhashRows = 4
  val DhashCols = 16

  /** Integer dHash (difference hash) of one GRF1 payload: sample a
    * [[DhashRows]]×[[DhashCols]] luminance grid from the decoded raster
    * (nearest-neighbor at floor-mapped coordinates sy = r·h/4,
    * sx = x·w/16 — the integer twin of [[resizeOne]]'s mapping; luma is
    * the UNSCALED channel sum, gradient comparisons are scale-free), and
    * set bit r·15+x iff grid(r, x+1) > grid(r, x). Pure integer
    * arithmetic over the actual payload bytes — engine-portable by
    * construction, and invariant to re-encoding and (approximately) to
    * nearest-neighbor resize, which is exactly what the md5 frame
    * detector (`mm_dup_frames`) cannot see. Malformed payloads hash to
    * None (quarantine posture, as [[decodeOne]]).
    */
  private[graft] def dhashOne(payload: Array[Byte]): Option[Long] = {
    val meta = decodeOne(0L, payload)
    if (meta.format.startsWith("corrupt/")) None
    else {
      val (w, h, c) = (meta.width, meta.height, meta.channels)
      def g(r: Int, x: Int): Long = {
        val sy = r * h / DhashRows
        val sx = x * w / DhashCols
        var s = 0L
        var ch = 0
        while (ch < c) {
          s += payload(HeaderBytes + (sy * w + sx) * c + ch) & 0xff
          ch += 1
        }
        s
      }
      var hash = 0L
      var r = 0
      while (r < DhashRows) {
        var x = 0
        while (x < DhashCols - 1) {
          if (g(r, x + 1) > g(r, x)) hash |= 1L << (r * (DhashCols - 1) + x)
          x += 1
        }
        r += 1
      }
      Some(hash)
    }
  }

  /** Batched partition-local dHash over (doc_id, payload) — the same
    * mapPartitions shape as [[decode]]; corrupt payloads drop (their
    * doc_ids stay visible through the decode/quarantine path).
    */
  def dhash(withPayloadDf: DataFrame): DataFrame = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { case (id, p) => dhashOne(p).map(hh => (id, hh)) }
        }
      }
      .toDF("doc_id", "phash")
  }

  /** Batched partition-local decode: payloads grouped into fixed-size
    * batches (mirroring a real codec's batch API) and decoded in place.
    */
  def decode(withPayloadDf: DataFrame): Dataset[MediaMeta] = {
    val spark = withPayloadDf.sparkSession
    import spark.implicits._
    withPayloadDf
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, payload) => decodeOne(id, payload) }
        }
      }
  }
}
