package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * decoded per-partition in batches.
  *
  * Two decode tiers. [[parseImageHeader]] is a REAL container-header
  * parser — PNG IHDR, JPEG SOFn marker scan, GIF logical screen
  * descriptor, BMP DIB header, all pure-JVM byte reading, no codec
  * library — driven by [[decodeImageMeta]] and oracle-gated against
  * generator ground truth (`ext_multimodal_real_meta` fixture). Full
  * pixel decode still needs codec libraries this container lacks, so the
  * frame/feature/resize family keeps the DETERMINISTIC STUB (`stubDecode`,
  * metadata as a pure function of payload bytes). Everything around both
  * tiers is the real production shape: binary column in, `mapPartitions`
  * with a product encoder (one iterator per partition = one "decoder" per
  * task, amortizing per-batch model/codec init exactly like `mapInPandas`),
  * typed metadata out. Swapping the stub for a JNI/codec call changes no
  * plumbing.
  */
object Multimodal {

  final case class MediaPayload(doc_id: Long, payload: Array[Byte])

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB decoder: metadata as a pure function of the payload size. A real
    * implementation parses the container header here.
    */
  def stubDecode(p: MediaPayload): MediaMeta = {
    val n = p.payload.length.toLong
    MediaMeta(
      doc_id = p.doc_id,
      n_bytes = n,
      width = (64 + n % 577).toInt,
      height = (64 + (n * 31) % 353).toInt,
      n_frames = (1 + n % 7).toInt)
  }

  /** Attach a binary payload column (here: the utf-8 text bytes standing in
    * for real media bytes) and decode per-partition.
    */
  def decodeMeta(spark: SparkSession, docs: DataFrame, idCol: String = "doc_id"): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads(docs, idCol)
      .mapPartitions { it =>
        // per-partition init site (codec/model handle goes here)
        it.map(stubDecode)
      }
  }

  final case class ImageMeta(
      media_id: Long,
      fmt: String,
      width: Option[Int],
      height: Option[Int],
      n_bytes: Long,
      ok: Int)

  /** Real container-header parse: `Some((format, width, height))` for a
    * payload whose header is a well-formed PNG / JPEG / GIF / BMP /
    * WebP / TIFF, `None` for anything truncated, corrupt, or
    * unrecognized (a null payload counts as empty = unrecognized).
    * Reads ONLY the header bytes — trailing payload content is never
    * touched, which is the production property that makes header-only
    * scans cheap on multi-MB media columns (columnar readers fetch the
    * binary cell either way, but the CPU cost stays O(header)).
    *
    *   - PNG (ISO/IEC 15948 §5.2/§11.2.2): 8-byte signature, first chunk
    *     must be IHDR with length 13; width/height big-endian u32 > 0.
    *   - JPEG (ITU T.81 §B.2): SOI then a marker walk over variable-
    *     length segments until a frame header SOFn (C0–CF minus C4/C8/CC,
    *     which are DHT/JPG/DAC); height/width big-endian u16 from the
    *     SOF payload (spec-minimal SOF length is 11: 8 fixed bytes +
    *     3 per component, Nf ≥ 1). Standalone markers (TEM, RSTn) carry
    *     no length. Hitting SOS/EOI or truncation before a SOF ⇒
    *     malformed — but a buffer ending exactly after the SOF width
    *     bytes still parses (the dims were readable).
    *   - GIF (87a/89a §17-18): 6-byte version magic, then the logical
    *     screen descriptor's little-endian u16 width/height.
    *   - BMP (BITMAPINFOHEADER): "BM", DIB size ≥ 40 at offset 14,
    *     little-endian i32 width and height (height may be negative =
    *     top-down; dimensions are its absolute value).
    *   - WebP (RIFF container): "RIFF" + "WEBP", then the first chunk's
    *     FourCC picks the codec layout — "VP8 " (lossy: 3-byte frame
    *     tag, 9D 01 2A keyframe start code, 14-bit LE dims), "VP8L"
    *     (lossless: 0x2F signature then width−1/height−1 as two 14-bit
    *     LE fields), "VP8X" (extended: canvas width−1/height−1 as LE
    *     u24 at data+4/data+7). Any other FourCC (a RIFF that is not a
    *     WebP image, e.g. WAVE audio) rejects.
    *   - TIFF 6.0: "II"+42 (LE) or "MM"+42 (BE), u32 offset to the
    *     first IFD, then a bounded IFD-entry walk for tags 256
    *     (ImageWidth) and 257 (ImageLength), each SHORT (type 3,
    *     left-justified in the value field) or LONG (type 4). Both tags
    *     must be present and positive; an IFD offset past the buffer or
    *     a truncated entry table rejects.
    */
  def parseImageHeader(bIn: Array[Byte]): Option[(String, Int, Int)] = {
    // a null binary cell is byte garbage like any other: reject, don't NPE
    val b: Array[Byte] = if (bIn == null) Array.emptyByteArray else bIn
    def u8(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def ascii(from: Int, s: String): Boolean =
      b.length >= from + s.length &&
        s.indices.forall(k => u8(from + k) == s.charAt(k).toInt)

    if (b.length >= 24 && u8(0) == 0x89 && ascii(1, "PNG") &&
      u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a) {
      if (be32(8) != 13L || !ascii(12, "IHDR")) None
      else {
        val w = be32(16); val h = be32(20)
        // u32 but capped at 2^31-1 by the PNG spec; 0 is malformed
        if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          Some(("png", w.toInt, h.toInt))
        else None
      }
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      var res: Option[(String, Int, Int)] = None
      var stop = false
      while (!stop && i + 1 < b.length) {
        if (u8(i) != 0xff) { stop = true } // marker desync = corrupt
        else {
          val m = u8(i + 1)
          if (m == 0xff) i += 1 // fill bytes before a marker are legal
          else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
          else if (m == 0xd9 || m == 0xda) stop = true // EOI/SOS: no SOF seen
          else if (i + 3 >= b.length) stop = true // truncated segment length
          else {
            val len = be16(i + 2)
            if (len < 2) stop = true
            else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
              // SOF payload: precision u8, height u16, width u16, Nf u8,
              // 3 bytes per component — spec minimum len is 11 (Nf ≥ 1).
              // Width's last byte is index i+8, so i+9 <= length suffices:
              // a buffer truncated exactly after the width still parses.
              if (i + 9 <= b.length && len >= 11) {
                val h = be16(i + 5); val w = be16(i + 7)
                if (w > 0 && h > 0) res = Some(("jpeg", w, h))
              }
              stop = true
            } else i += 2 + len
          }
        }
      }
      res
    } else if (ascii(0, "GIF87a") || ascii(0, "GIF89a")) {
      if (b.length < 10) None
      else {
        val w = le16(6); val h = le16(8)
        if (w > 0 && h > 0) Some(("gif", w, h)) else None
      }
    } else if (b.length >= 26 && ascii(0, "BM") && le32(14) >= 40) {
      val w = le32(18); val h = le32(22)
      // h = Int.MinValue has no positive absolute value (math.abs returns
      // it unchanged) — a crafted header must reject, not emit ok=1 with
      // a negative height
      if (w > 0 && h != 0 && h != Int.MinValue) Some(("bmp", w, math.abs(h)))
      else None
    } else if (b.length >= 16 && ascii(0, "RIFF") && ascii(8, "WEBP")) {
      // first chunk's FourCC at 12, chunk payload starts at 20
      def le24(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
      if (ascii(12, "VP8 ")) {
        // lossy: 3-byte frame tag, keyframe start code 9D 01 2A, then
        // 14-bit LE width/height (top 2 bits are the scale fields)
        if (b.length >= 30 && u8(23) == 0x9d && u8(24) == 0x01 && u8(25) == 0x2a) {
          val w = le16(26) & 0x3fff; val h = le16(28) & 0x3fff
          if (w > 0 && h > 0) Some(("webp", w, h)) else None
        } else None
      } else if (ascii(12, "VP8L")) {
        // lossless: 0x2F signature byte, then width-1 (14 bits) and
        // height-1 (next 14 bits) packed LE from the following 4 bytes
        if (b.length >= 25 && u8(20) == 0x2f) {
          val v = le32(21)
          Some(("webp", (v & 0x3fff) + 1, ((v >>> 14) & 0x3fff) + 1))
        } else None
      } else if (ascii(12, "VP8X")) {
        // extended: 4 flag/reserved bytes, canvas width-1 / height-1 LE u24
        if (b.length >= 30) Some(("webp", le24(24) + 1, le24(27) + 1))
        else None
      } else None // a RIFF that is not a WebP image chunk (e.g. WAVE)
    } else if (b.length >= 8 &&
      ((u8(0) == 0x49 && u8(1) == 0x49 && u8(2) == 42 && u8(3) == 0) ||
        (u8(0) == 0x4d && u8(1) == 0x4d && u8(2) == 0 && u8(3) == 42))) {
      // TIFF 6.0: endianness from the magic, then walk the first IFD's
      // entry table for ImageWidth (256) / ImageLength (257). The walk is
      // bounded by the declared entry count and every read is
      // bounds-checked, so a hostile offset can't run off the buffer.
      val le = u8(0) == 0x49
      def r16(i: Int): Int = if (le) le16(i) else be16(i)
      def r32(i: Int): Long = if (le) le32(i).toLong & 0xffffffffL else be32(i)
      val ifdOff = r32(4)
      if (ifdOff < 8 || ifdOff + 2 > b.length) None
      else {
        val off = ifdOff.toInt
        val nEntries = r16(off)
        var w = -1L; var h = -1L
        var bad = false
        var k = 0
        while (k < nEntries && !bad) {
          val e = off + 2 + 12 * k
          if (e + 12 > b.length) bad = true
          else {
            val tag = r16(e)
            if (tag == 256 || tag == 257) {
              // SHORT (3) is left-justified in the 4-byte value field
              // regardless of endianness; LONG (4) fills it
              val typ = r16(e + 2)
              val v =
                if (typ == 3) r16(e + 8).toLong
                else if (typ == 4) r32(e + 8)
                else -1L
              if (v <= 0) bad = true
              else if (tag == 256) w = v else h = v
            }
            k += 1
          }
        }
        if (!bad && w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue)
          Some(("tiff", w.toInt, h.toInt))
        else None
      }
    } else None
  }

  /** Real header-parse metadata over a binary media column — the
    * production form of [[decodeMeta]]: one parse per row inside
    * `mapPartitions`, malformed headers REJECTED as typed rows
    * (`fmt = "unknown"`, null dims, `ok = 0`) rather than dropped or
    * thrown, so a 100 TB scan over crawled media never dies on byte
    * garbage and the rejection rate is itself queryable. A NULL payload
    * cell is treated as an empty payload (an `ok = 0` rejection row,
    * `n_bytes = 0`); rows whose id cell is NULL are dropped before the
    * decode — the typed `Long` key can't carry them, and a crawled
    * corpus row without a key isn't attributable to anything downstream
    * anyway. A NON-null id that fails the long cast is a misconfigured
    * id column, not a data row to skip: it fails the job loudly (the
    * silent alternative is a 100%-empty result that looks like an empty
    * corpus).
    */
  def decodeImageMeta(
      spark: SparkSession, media: DataFrame,
      idCol: String = "media_id",
      payloadCol: String = "payload"): Dataset[ImageMeta] = {
    import spark.implicits._
    media.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"),
      col(idCol).isNotNull.as("src_id_present"))
      .where(col("doc_id").isNotNull || col("src_id_present"))
      .select("doc_id", "payload")
      .as[MediaPayloadOpt]
      .mapPartitions { it =>
        it.map { p =>
          val id = p.doc_id.getOrElse(throw new IllegalArgumentException(
            "decodeImageMeta: id column has non-null values that do not " +
              "cast to long — wrong column, or a string-keyed corpus"))
          val bytes = if (p.payload == null) Array.emptyByteArray else p.payload
          parseImageHeader(bytes) match {
            case Some((fmt, w, h)) =>
              ImageMeta(id, fmt, Some(w), Some(h), bytes.length.toLong, 1)
            case None =>
              ImageMeta(id, "unknown", None, None, bytes.length.toLong, 0)
          }
        }
      }
  }

  /** [[MediaPayload]] with a nullable key: lets [[decodeImageMeta]] see
    * a failed id cast (source non-null, cast null) and fail loudly
    * instead of the Long encoder masking it as a dropped row. */
  final case class MediaPayloadOpt(doc_id: Option[Long], payload: Array[Byte])

  final case class Frame(doc_id: Long, frame_idx: Int, frame_len: Int, frame: Array[Byte])

  final case class Features(doc_id: Long, features: Array[Float])

  private def payloads(docs: DataFrame, idCol: String): Dataset[MediaPayload] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
      col("text").cast("binary").as("payload")).as[MediaPayload]
  }

  /** Frame sampling: split each payload into its `n_frames` (from the stub
    * decode) equal chunks — one output row per frame. The real analogue is
    * keyframe extraction; the explode shape (1 row in → n rows out via
    * mapPartitions) and the per-frame binary column are production-real.
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame, idCol: String = "doc_id"): Dataset[Frame] = {
    import spark.implicits._
    payloads(docs, idCol).mapPartitions { it =>
      it.flatMap { p =>
        val meta = stubDecode(p)
        val n = p.payload.length
        val sz = (n + meta.n_frames - 1) / meta.n_frames // ceil
        (0 until meta.n_frames).iterator.map { i =>
          val from = math.min(i * sz, n)
          val until = math.min((i + 1) * sz, n)
          Frame(p.doc_id, i, until - from, java.util.Arrays.copyOfRange(p.payload, from, until))
        }
      }
    }
  }

  final case class ResizedMedia(
      doc_id: Long, width: Int, height: Int, n_bytes: Long, resized: Array[Byte])

  /** Resize stub: emits target-dimension metadata plus a deterministic
    * byte subsample standing in for the rescaled pixel buffer (every
    * `stride`-th byte, stride chosen so output ≈ targetW·targetH/256
    * bytes). The real analogue swaps the subsample for a scaler call;
    * the 1-row-in/1-smaller-row-out mapPartitions shape is identical.
    */
  def resize(spark: SparkSession, docs: DataFrame, targetW: Int, targetH: Int,
      idCol: String = "doc_id"): Dataset[ResizedMedia] = {
    import spark.implicits._
    payloads(docs, idCol).mapPartitions { it =>
      it.map { p =>
        val n = p.payload.length
        val outLen = math.max(1, math.min(n, targetW * targetH / 256))
        val stride = math.max(1, n / outLen)
        val out = (0 until n by stride).take(outLen).map(p.payload).toArray
        ResizedMedia(p.doc_id, targetW, targetH, n.toLong, out)
      }
    }
  }

  /** Feature extraction stub: a 16-dim byte-histogram "embedding" per
    * payload (normalized). A real model swap changes only the body —
    * batch shape (iterator in, fixed-dim float vectors out) is what a
    * GPU-backed extractor needs.
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame, idCol: String = "doc_id"): Dataset[Features] = {
    import spark.implicits._
    payloads(docs, idCol).mapPartitions { it =>
      it.map { p =>
        val hist = new Array[Float](16)
        p.payload.foreach(b => hist((b & 0xFF) % 16) += 1f)
        val n = math.max(1, p.payload.length).toFloat
        Features(p.doc_id, hist.map(_ / n))
      }
    }
  }
}
