package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * decoded per-partition in batches.
  *
  * Three decode tiers. [[parseImageHeader]] is a REAL container-header
  * parser — PNG IHDR, JPEG SOFn marker scan, GIF logical screen
  * descriptor, BMP DIB header, WebP RIFF, TIFF/BigTIFF IFD walk, all
  * pure-JVM byte reading, no codec library — driven by
  * [[decodeImageMeta]] and oracle-gated against generator ground truth
  * (`ext_multimodal_real_meta` fixture). [[decodePixels]] is a REAL
  * pixel decoder for the two formats the bare JDK can handle —
  * uncompressed 24-bit BMP and PNG (`java.util.zip.Inflater` + the five
  * scanline unfilters) — feeding pixel-true features
  * ([[extractFeatures]], [[pixelStats]]) and a real integer box resample
  * ([[resize]], [[resizePixels]]), oracle-gated against generator pixel
  * ground truth. Formats needing codec libraries this container lacks
  * fall back to the DETERMINISTIC STUB tier (`stubDecode` /
  * byte-histogram / byte-subsample — metadata as a pure function of
  * payload bytes). Everything around all tiers is the real production
  * shape: binary column in, `mapPartitions` with a product encoder (one
  * iterator per partition = one "decoder" per task, amortizing per-batch
  * model/codec init exactly like `mapInPandas`), typed output out.
  * Swapping a JNI codec in for the stub branch changes no plumbing.
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
    *   - TIFF 6.0 / BigTIFF: "II"/"MM" byte-order mark, magic 42
    *     (classic: u32 offsets, 12-byte entries) or 43 (BigTIFF: u64
    *     offsets/counts, 20-byte entries), then a bounded walk over the
    *     IFD chain for tags 256 (ImageWidth) / 257 (ImageLength), each
    *     SHORT (3), LONG (4), or LONG8 (16, BigTIFF) with count 1 — a
    *     count != 1 means the value field holds a file offset, so it
    *     rejects rather than misread. When NewSubfileType (254) marks
    *     the first IFD as a reduced-resolution thumbnail, the walk
    *     follows the next-IFD pointers (≤ 8 hops) and prefers the first
    *     full-resolution IFD, falling back to the thumbnail's dims if
    *     the chain ends without one. An IFD offset past the buffer or a
    *     truncated entry table rejects.
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
    } else if (b.length >= 8 && (
      (u8(0) == 0x49 && u8(1) == 0x49 && le16(2) == 42) ||
        (u8(0) == 0x4d && u8(1) == 0x4d && be16(2) == 42) ||
        (u8(0) == 0x49 && u8(1) == 0x49 && le16(2) == 43) ||
        (u8(0) == 0x4d && u8(1) == 0x4d && be16(2) == 43))) {
      // TIFF 6.0 (magic 42) and BigTIFF (magic 43, 8-byte offsets/counts,
      // 20-byte entries): endianness from the byte-order mark, then a
      // bounded walk over the IFD CHAIN for ImageWidth (256) /
      // ImageLength (257). Crawled corpora routinely put a
      // reduced-resolution thumbnail in the FIRST IFD (NewSubfileType
      // tag 254, bit 0) with the full image behind the next-IFD pointer,
      // so the walk prefers the first NON-reduced IFD with valid dims
      // and falls back to the first valid (reduced) one when the chain
      // ends without a full-resolution IFD. Every read is bounds-checked
      // and the chain is capped at 8 IFDs, so hostile offsets can
      // neither run off the buffer nor loop; any structural violation in
      // a walked IFD rejects the whole file (a count != 1 on a dimension
      // tag means the value field holds a file OFFSET, not the
      // dimension — misreading it would emit ok=1 with garbage dims).
      val le = u8(0) == 0x49
      val big = (if (le) le16(2) else be16(2)) == 43
      def r16(i: Int): Int = if (le) le16(i) else be16(i)
      def r32(i: Int): Long = if (le) le32(i).toLong & 0xffffffffL else be32(i)
      def r64(i: Int): Long =
        if (le) (0 until 8).map(k => u8(i + k).toLong << (8 * k)).reduce(_ | _)
        else (0 until 8).map(k => u8(i + k).toLong << (8 * (7 - k))).reduce(_ | _)
      // BigTIFF header: u16 offset size (must be 8), u16 reserved 0,
      // u64 first-IFD offset; classic: u32 first-IFD offset
      val firstIfd: Long =
        if (!big) r32(4)
        else if (b.length >= 16 && r16(4) == 8 && r16(6) == 0) r64(8)
        else -1L
      val entrySize = if (big) 20 else 12
      val headSize = if (big) 8 else 2 // entry-count field width
      val nextSize = if (big) 8 else 4 // next-IFD pointer width
      // one IFD: Left(()) = structural violation (reject the file);
      // Right((width, height, reducedFlag, nextIfdOffset))
      def walkIfd(off: Int): Either[Unit, (Long, Long, Boolean, Long)] = {
        if (off < 8 || off + headSize > b.length) return Left(())
        val nEntries = if (big) r64(off) else r16(off).toLong
        // entry counts are bounded by what the buffer can physically
        // hold before the arithmetic below touches any byte
        if (nEntries < 0 || nEntries > (b.length - off - headSize) / entrySize)
          return Left(())
        val n = nEntries.toInt
        var w = -1L; var h = -1L
        var reduced = false
        var k = 0
        while (k < n) {
          val e = off + headSize + entrySize * k
          val tag = r16(e)
          val typ = r16(e + 2)
          val cnt = if (big) r64(e + 4) else r32(e + 4)
          val vOff = if (big) e + 12 else e + 8
          def value: Long =
            if (typ == 3) r16(vOff).toLong
            else if (typ == 4) r32(vOff)
            else if (typ == 16 && big) r64(vOff)
            else -1L
          if (tag == 256 || tag == 257) {
            if (cnt != 1) return Left(()) // offset-holding value field
            val v = value
            if (v <= 0) return Left(())
            if (tag == 256) w = v else h = v
          } else if (tag == 254) {
            // NewSubfileType: LONG count 1 per spec; bit 0 = this IFD is
            // a reduced-resolution (thumbnail) image
            if (cnt == 1 && value >= 0) reduced = (value & 1L) == 1L
            else return Left(())
          }
          k += 1
        }
        val nextOff = off + headSize + entrySize * n
        val next =
          if (nextOff + nextSize > b.length) -1L // absent pointer = chain ends
          else if (big) r64(nextOff) else r32(nextOff)
        Right((w, h, reduced, next))
      }
      var off = firstIfd
      var hops = 0
      var fallback: Option[(Int, Int)] = None // first valid reduced IFD
      var result: Option[(String, Int, Int)] = None
      var rejected = firstIfd < 8 || firstIfd > Int.MaxValue
      while (!rejected && result.isEmpty && off >= 8 && off <= Int.MaxValue &&
        hops < 8) {
        walkIfd(off.toInt) match {
          case Left(()) =>
            // a bad FIRST IFD rejects; a bad later IFD just ends the
            // walk — the chain tail is damage, the candidate is not
            if (hops == 0) rejected = true
            off = 0
          case Right((w, h, reduced, next)) =>
            val valid = w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue
            if (valid && !reduced) result = Some(("tiff", w.toInt, h.toInt))
            else if (valid && fallback.isEmpty) fallback = Some((w.toInt, h.toInt))
            off = next
        }
        hops += 1
      }
      result.orElse(fallback.map { case (w, h) => ("tiff", w, h) })
        .filter(_ => !rejected)
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
    * corpus). NOTE the failure arrives mid-job, from whichever executor
    * hits the first bad row — on a very large scan that can be hours
    * in. Callers launching big jobs should pre-validate the id column
    * (`WHERE idCol IS NOT NULL AND CAST(idCol AS LONG) IS NULL LIMIT 1`
    * is one cheap upfront probe) when a late failure is costlier than
    * one extra scan of the key column.
    */
  def decodeImageMeta(
      spark: SparkSession, media: DataFrame,
      idCol: String = "media_id",
      payloadCol: String = "payload"): Dataset[ImageMeta] = {
    import spark.implicits._
    mediaPayloadsOpt(media, idCol, payloadCol)
      .mapPartitions { it =>
        it.map { p =>
          val id = requireId(p)
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

  /** Decoded 8-bit RGB pixel buffer: row-major, 3 bytes per pixel. */
  final case class PixelImage(width: Int, height: Int, rgb: Array[Byte])

  /** Pixel-decode size cap (64 Mpx): a hostile header claiming huge
    * dims must not allocate unbounded executor memory — over-cap
    * payloads are px-undecodable (header metadata still parses). */
  private val MaxDecodePixels: Long = 1L << 26

  /** REAL pixel decode for the two formats pure JDK can handle with
    * zero codec dependencies: uncompressed BMP (24-bit BGR and 32-bit
    * BGRX, row padding, bottom-up and top-down) and PNG (zlib IDAT via
    * `java.util.zip.Inflater`, all five scanline filters unfiltered,
    * 8-bit grayscale / truecolor / gray+alpha / RGBA — gray replicated
    * to RGB, alpha dropped). Anything else — palette/interlaced PNG,
    * RLE/bitfields BMP, every compressed codec — returns None and falls
    * back to the caller's stub tier; swapping a JNI codec in for those
    * changes no plumbing. Truncated pixel arrays, corrupt zlib streams,
    * and over-[[MaxDecodePixels]] dims all reject rather than throw:
    * the 100 TB contract is byte garbage never kills the scan.
    */
  def decodePixels(bIn: Array[Byte]): Option[PixelImage] = {
    val b: Array[Byte] = if (bIn == null) Array.emptyByteArray else bIn
    parseImageHeader(b) match {
      case Some(("bmp", w, h)) => decodeBmpPixels(b, w, h)
      case Some(("png", w, h)) => decodePngPixels(b, w, h)
      case _ => None
    }
  }

  private def decodeBmpPixels(b: Array[Byte], w: Int, h: Int): Option[PixelImage] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b.length < 54) return None
    val dataOff = le32(10).toLong & 0xffffffffL
    val rawH = le32(22) // sign picks bottom-up (+) vs top-down (-)
    val planes = le16(26); val bpp = le16(28); val comp = le32(30)
    // 24-bit BGR and 32-bit BGRX (both BI_RGB = uncompressed); RLE,
    // bitfields, and palette depths stay with the stub tier
    if (planes != 1 || (bpp != 24 && bpp != 32) || comp != 0) return None
    if (w.toLong * h > MaxDecodePixels) return None
    val px = bpp / 8
    val stride = ((w * px + 3) / 4) * 4 // rows pad to 4-byte boundaries
    if (dataOff < 54L || dataOff + stride.toLong * h > b.length) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (rawH > 0) h - 1 - y else y
      val src = dataOff.toInt + srcRow * stride
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        out(o) = b(src + x * px + 2) // BMP stores BGR(X)
        out(o + 1) = b(src + x * px + 1)
        out(o + 2) = b(src + x * px)
        x += 1
      }
      y += 1
    }
    Some(PixelImage(w, h, out))
  }

  private def decodePngPixels(b: Array[Byte], w: Int, h: Int): Option[PixelImage] = {
    def u8(i: Int): Int = b(i) & 0xff
    if (b.length < 33) return None
    // IHDR fields past the dims parseImageHeader already verified.
    // 8-bit grayscale (0), truecolor (2), gray+alpha (4), RGBA (6);
    // palette (3), sub-8-bit depths, and Adam7 interlace stay with the
    // stub tier
    val depth = u8(24); val color = u8(25)
    if (depth != 8 || !(color == 0 || color == 2 || color == 4 || color == 6) ||
      u8(26) != 0 || u8(27) != 0 || u8(28) != 0) return None
    if (w.toLong * h > MaxDecodePixels) return None
    val bpp = color match { case 0 => 1; case 2 => 3; case 4 => 2; case _ => 4 }
    val gray = color == 0 || color == 4
    // chunk walk: concatenate IDAT payloads; a file truncated before
    // IEND rejects (the pixel stream is not trustworthy without it)
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8
    var sawEnd = false
    while (!sawEnd) {
      if (pos + 8 > b.length) return None
      val clen = ((u8(pos).toLong << 24) | (u8(pos + 1) << 16) |
        (u8(pos + 2) << 8) | u8(pos + 3))
      val dataAt = pos + 8
      if (clen < 0 || dataAt + clen + 4 > b.length) return None
      val typ = new String(b, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (typ == "IDAT") idat.write(b, dataAt, clen.toInt)
      if (typ == "IEND") sawEnd = true
      pos = dataAt + clen.toInt + 4 // skip data + CRC
    }
    if (idat.size == 0) return None
    val raw = new Array[Byte](h * (1 + w * bpp)) // filter byte + scanline
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val got =
      try {
        var off = 0
        var stalled = false
        while (off < raw.length && !inf.finished() && !stalled) {
          val n = inf.inflate(raw, off, raw.length - off)
          // inflate() == 0 with the stream unfinished means it wants more
          // input (truncated) OR a preset dictionary (FDICT zlib header) —
          // both unrecoverable here, and looping on the latter would spin
          // forever on a single hostile row
          if (n == 0 && !inf.finished()) stalled = true
          off += n
        }
        off
      } catch {
        case _: java.util.zip.DataFormatException => -1
      } finally inf.end()
    if (got != raw.length) return None
    // unfilter (ISO 15948 §9): recon against left/up/up-left neighbors
    val out = new Array[Byte](w * h * 3)
    val line = new Array[Byte](w * bpp)
    val prior = new Array[Byte](w * bpp)
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + w * bpp)
      val ft = raw(rowOff) & 0xff
      if (ft > 4) return None
      var i = 0
      while (i < w * bpp) {
        val x = raw(rowOff + 1 + i) & 0xff
        val a = if (i >= bpp) line(i - bpp) & 0xff else 0
        val up = prior(i) & 0xff
        val c = if (i >= bpp) prior(i - bpp) & 0xff else 0
        val recon = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + ((a + up) >> 1)
          case _ => // Paeth
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        line(i) = (recon & 0xff).toByte
        i += 1
      }
      var px = 0
      while (px < w) {
        val o = (y * w + px) * 3
        if (gray) { // replicate the gray sample; alpha (if any) dropped
          out(o) = line(px * bpp); out(o + 1) = line(px * bpp)
          out(o + 2) = line(px * bpp)
        } else {
          out(o) = line(px * bpp)
          out(o + 1) = line(px * bpp + 1)
          out(o + 2) = line(px * bpp + 2) // alpha (RGBA) dropped
        }
        px += 1
      }
      System.arraycopy(line, 0, prior, 0, line.length)
      y += 1
    }
    Some(PixelImage(w, h, out))
  }

  /** Integer box resample to (tw, th), both directions: output pixel
    * (px, py) averages the source box `[⌊px·W/tw⌋, max(that+1,
    * ⌊(px+1)·W/tw⌋))` (and likewise for rows), channel mean =
    * `⌊sum/count⌋`. Downsampling averages real boxes; upsampling
    * degenerates to nearest-neighbor (1-pixel boxes) — one formula,
    * no floats, so engine and oracle agree bit-exactly.
    */
  def boxResample(img: PixelImage, tw: Int, th: Int): PixelImage = {
    require(tw > 0 && th > 0, "target dims must be positive")
    val out = new Array[Byte](tw * th * 3)
    var py = 0
    while (py < th) {
      val y0 = (py.toLong * img.height / th).toInt
      val y1 = math.max(y0 + 1, ((py + 1).toLong * img.height / th).toInt)
      var px = 0
      while (px < tw) {
        val x0 = (px.toLong * img.width / tw).toInt
        val x1 = math.max(x0 + 1, ((px + 1).toLong * img.width / tw).toInt)
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val o = (y * img.width + x) * 3
            sr += img.rgb(o) & 0xff
            sg += img.rgb(o + 1) & 0xff
            sb += img.rgb(o + 2) & 0xff
            x += 1
          }
          y += 1
        }
        val n = (y1 - y0).toLong * (x1 - x0)
        val oo = (py * tw + px) * 3
        out(oo) = (sr / n).toByte
        out(oo + 1) = (sg / n).toByte
        out(oo + 2) = (sb / n).toByte
        px += 1
      }
      py += 1
    }
    PixelImage(tw, th, out)
  }

  /** Per-image pixel statistics from the REAL decode: integer channel
    * sums and the integer luma sum `Σ(299·r + 587·g + 114·b)` —
    * integral on purpose, so the oracle compare is bit-exact. Rows
    * whose payload has no pure-JVM pixel path ([[decodePixels]] None)
    * emit `px_ok = 0` with null stats — same typed-rejection contract
    * as [[decodeImageMeta]]. */
  final case class PixelStats(
      media_id: Long,
      px_ok: Int,
      n_px: Option[Long],
      sum_r: Option[Long],
      sum_g: Option[Long],
      sum_b: Option[Long],
      sum_luma: Option[Long])

  def pixelStats(
      spark: SparkSession, media: DataFrame,
      idCol: String = "media_id",
      payloadCol: String = "payload"): Dataset[PixelStats] = {
    import spark.implicits._
    mediaPayloadsOpt(media, idCol, payloadCol).mapPartitions { it =>
      it.map { p =>
        val id = requireId(p)
        decodePixels(p.payload) match {
          case Some(img) =>
            var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
            var i = 0
            while (i < img.rgb.length) {
              val r = img.rgb(i) & 0xff
              val g = img.rgb(i + 1) & 0xff
              val b = img.rgb(i + 2) & 0xff
              sr += r; sg += g; sb += b
              sl += 299L * r + 587L * g + 114L * b
              i += 3
            }
            PixelStats(id, 1, Some(img.width.toLong * img.height),
              Some(sr), Some(sg), Some(sb), Some(sl))
          case None =>
            PixelStats(id, 0, None, None, None, None, None)
        }
      }
    }
  }

  /** [[resize]]'s pixel-true face over a real media column: decoded
    * payloads are [[boxResample]]d to (tw, th) with the resampled RGB
    * buffer AND its integer checksum (`Σ` unsigned bytes) emitted;
    * undecodable payloads reject as `px_ok = 0` typed rows. */
  final case class ResizedPixels(
      media_id: Long,
      px_ok: Int,
      out_w: Option[Int],
      out_h: Option[Int],
      checksum: Option[Long],
      resized: Array[Byte])

  def resizePixels(
      spark: SparkSession, media: DataFrame, targetW: Int, targetH: Int,
      idCol: String = "media_id",
      payloadCol: String = "payload"): Dataset[ResizedPixels] = {
    import spark.implicits._
    mediaPayloadsOpt(media, idCol, payloadCol).mapPartitions { it =>
      it.map { p =>
        val id = requireId(p)
        decodePixels(p.payload) match {
          case Some(img) =>
            val rz = boxResample(img, targetW, targetH)
            var sum = 0L
            rz.rgb.foreach(b => sum += (b & 0xff))
            ResizedPixels(id, 1, Some(targetW), Some(targetH), Some(sum), rz.rgb)
          case None =>
            ResizedPixels(id, 0, None, None, None, Array.emptyByteArray)
        }
      }
    }
  }

  /** Shared (id, payload) projection with the nullable-key contract of
    * [[decodeImageMeta]] — null ids dropped, non-null ids that fail the
    * long cast fail loudly via [[requireId]]. */
  private def mediaPayloadsOpt(media: DataFrame, idCol: String,
      payloadCol: String): Dataset[MediaPayloadOpt] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"),
      col(idCol).isNotNull.as("src_id_present"))
      .where(col("doc_id").isNotNull || col("src_id_present"))
      .select("doc_id", "payload")
      .as[MediaPayloadOpt]
  }

  private def requireId(p: MediaPayloadOpt): Long =
    p.doc_id.getOrElse(throw new IllegalArgumentException(
      "media id column has non-null values that do not cast to long — " +
        "wrong column, or a string-keyed corpus"))

  final case class Frame(doc_id: Long, frame_idx: Int, frame_len: Int, frame: Array[Byte])

  /** `pixel_true = 1` when the vector came from the REAL pixel decode
    * (BMP/PNG payloads, [[decodePixels]]); 0 = the byte-histogram stub
    * tier (no pure-JVM codec for the format). */
  final case class Features(doc_id: Long, features: Array[Float], pixel_true: Int)

  private def payloads(docs: DataFrame, idCol: String,
      payloadCol: String = "text"): Dataset[MediaPayload] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload")).as[MediaPayload]
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

  /** `pixel_true = 1` rows carry a REAL [[boxResample]]d RGB buffer in
    * `resized`; 0 = the deterministic byte-subsample stub tier. */
  final case class ResizedMedia(
      doc_id: Long, width: Int, height: Int, n_bytes: Long,
      resized: Array[Byte], pixel_true: Int)

  /** Resize: payloads with a pure-JVM pixel path (BMP/PNG,
    * [[decodePixels]]) are REALLY resampled — integer box filter,
    * [[boxResample]] — to (targetW, targetH), RGB buffer out. Every
    * other format keeps the deterministic STUB (target-dimension
    * metadata plus a byte subsample of ≈ targetW·targetH/256 bytes
    * standing in for the rescaled buffer; a JNI codec swap changes only
    * that branch). The 1-row-in/1-smaller-row-out mapPartitions shape
    * is identical in both tiers.
    */
  def resize(spark: SparkSession, docs: DataFrame, targetW: Int, targetH: Int,
      idCol: String = "doc_id", payloadCol: String = "text"): Dataset[ResizedMedia] = {
    import spark.implicits._
    payloads(docs, idCol, payloadCol).mapPartitions { it =>
      it.map { p =>
        val bytes = if (p.payload == null) Array.emptyByteArray else p.payload
        decodePixels(bytes) match {
          case Some(img) =>
            val rz = boxResample(img, targetW, targetH)
            ResizedMedia(p.doc_id, targetW, targetH, bytes.length.toLong,
              rz.rgb, pixel_true = 1)
          case None =>
            val n = bytes.length
            val outLen = math.max(1, math.min(n, targetW * targetH / 256))
            val stride = math.max(1, n / outLen)
            val out = (0 until n by stride).take(outLen).map(bytes).toArray
            ResizedMedia(p.doc_id, targetW, targetH, n.toLong, out, pixel_true = 0)
        }
      }
    }
  }

  /** Feature extraction: payloads with a pure-JVM pixel path emit a
    * REAL pixel feature — the 16-bin luma histogram (integer luma
    * `(299r+587g+114b)/1000`, bins `luma >> 4`), normalized by pixel
    * count. Everything else keeps the 16-dim byte-histogram STUB. A
    * GPU-backed extractor swap changes only the body — the batch shape
    * (iterator in, fixed-dim float vectors out) is what it needs.
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame,
      idCol: String = "doc_id", payloadCol: String = "text"): Dataset[Features] = {
    import spark.implicits._
    payloads(docs, idCol, payloadCol).mapPartitions { it =>
      it.map { p =>
        val bytes = if (p.payload == null) Array.emptyByteArray else p.payload
        decodePixels(bytes) match {
          case Some(img) =>
            val cnt = new Array[Int](16)
            var i = 0
            while (i < img.rgb.length) {
              val luma = (299 * (img.rgb(i) & 0xff) +
                587 * (img.rgb(i + 1) & 0xff) +
                114 * (img.rgb(i + 2) & 0xff)) / 1000
              cnt(luma >> 4) += 1
              i += 3
            }
            val n = (img.width.toLong * img.height).toFloat
            Features(p.doc_id, cnt.map(_.toFloat / n), pixel_true = 1)
          case None =>
            val hist = new Array[Float](16)
            bytes.foreach(b => hist((b & 0xFF) % 16) += 1f)
            val n = math.max(1, bytes.length).toFloat
            Features(p.doc_id, hist.map(_ / n), pixel_true = 0)
        }
      }
    }
  }
}
