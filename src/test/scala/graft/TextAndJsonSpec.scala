package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, TextAnalysis}

/** Text analysis, fingerprinting, multimodal plumbing. */
class TextAndJsonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token counting: words, digit runs, single symbols") {
    val df = Seq((1L, "hello world 42 !? end")).toDF("doc_id", "text")
    val row = TextAnalysis.stats(df).collect().head
    assert(row.getAs[Int]("n_words") == 5)
    assert(row.getAs[Int]("n_tokens") == 6) // hello, world, 42, !, ?, end
  }

  test("buildVocab: frequency-ranked ids with alphabetic ties and minCount cut") {
    val df = Seq((1L, "b b b a a c c z")).toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(df, minCount = 2L, maxSize = 10)
      .select("term", "cf", "token_id").as[(String, Long, Long)].collect().toSet
    // z (cf=1) cut; b first by count; a before c on the tie
    assert(vocab == Set(("b", 3L, 0L), ("a", 2L, 1L), ("c", 2L, 2L)))
    val capped = TextAnalysis.buildVocab(df, minCount = 1L, maxSize = 2)
    assert(capped.count() == 2)
  }

  test("unigram log-prob: closed-form Laplace probabilities on a toy corpus") {
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // cf: a=2, b=2, c=1; N=5, V=3, alpha=1 => p(a)=p(b)=3/8, p(c)=1/4
    val out = TextAnalysis.unigramLogProb(df, alpha = 1.0)
      .select($"doc_id", $"n_tokens", $"avg_logprob", $"perplexity")
      .as[(Long, Long, Double, Double)].collect()
      .map { case (id, n, a, p) => id -> ((n, a, p)) }.toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1Avg = r6(math.log(3.0 / 8))
    val d2Avg = r6((math.log(3.0 / 8) + math.log(1.0 / 4)) / 2)
    assert(out(1L) == ((3L, d1Avg, r6(math.exp(-d1Avg)))))
    assert(out(2L) == ((2L, d2Avg, r6(math.exp(-d2Avg)))))
  }

  test("unigram log-prob: stopword soup scores lower perplexity than rare-word text") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextAnalysis.unigramLogProb(docs).cache()
    assert(out.count() == docs.count())
    // perplexity orders documents: every row is exp(-avg_logprob) of its own avg
    val bad = out.filter(abs($"perplexity" - exp(-$"avg_logprob")) > 1e-6).count()
    assert(bad == 0)
    out.unpersist()
  }

  test("stats ratios are consistent") {
    val df = Seq((1L, "the the cat")).toDF("doc_id", "text")
    val row = TextAnalysis.stats(df).collect().head
    assert(row.getAs[Int]("n_stopwords") == 2)
    assert(row.getAs[Int]("n_distinct_words") == 2)
    assert(math.abs(row.getAs[Double]("stopword_ratio") - 2.0 / 3) < 1e-15)
  }

  test("repetition signals: top/dup bigram fractions over non-distinct bigrams") {
    val df = Seq(
      (1L, "a b a b a b"), // bigrams: ab,ba,ab,ba,ab -> top 3/5, dup 5/5
      (2L, "x y z"),       // bigrams: xy,yz -> top 1/2, dup 0
      (3L, "single")       // no bigrams -> no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("top_bigram_count"),
          r.getAs[Double]("top_bigram_fraction"), r.getAs[Double]("dup_bigram_fraction")))
      .toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == ((5L, 3L, 0.6, 1.0)))
    assert(got(2L) == ((2L, 1L, 0.5, 0.0)))
  }

  test("fingerprint is invariant to case, punctuation and extra whitespace") {
    val df = Seq(
      (1L, "Hello,   World!"),
      (2L, "hello world"),
      (3L, "different")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(df)
      .select("doc_id", "fingerprint").as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("langId picks the language with most marker hits, 'und' when none") {
    val df = Seq(
      (1L, "the cat of a house"),
      (2L, "der hund die katze"),
      (3L, "xyzzy plugh")).toDF("doc_id", "text")
    val preds = TextAnalysis.langId(df)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(preds == Map(1L -> "en", 2L -> "de", 3L -> "und"))
    // trained profiles carry quotes (" l'" is a top French gram) — grams
    // are bound as values, never spliced into SQL text
    val fr = TextAnalysis.langId(
      Seq((1L, "c'est l'eau de l'or"), (2L, "none here")).toDF("doc_id", "text"),
      profiles = Map("fr" -> Seq(" l'", "\\q")))
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(fr == Map(1L -> "fr", 2L -> "und"))
    // a single-profile map (is-it-X-or-und) must not die in greatest()
    val solo = TextAnalysis.langId(df, profiles = Map("en" -> Seq(" the ")))
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(solo == Map(1L -> "en", 2L -> "und", 3L -> "und"))
  }

  test("parseImageHeader: real PNG/JPEG/GIF/BMP headers recover generator dims") {
    val rows = graft.fixtures.FixtureGen.mediaPayloads(500, seed = 1213L)
    assert(rows.count(_.valid == 1) >= 250, "fixture must be majority-real")
    assert(rows.exists(_.exp_fmt == "png") && rows.exists(_.exp_fmt == "jpeg") &&
      rows.exists(_.exp_fmt == "gif") && rows.exists(_.exp_fmt == "bmp") &&
      rows.exists(_.exp_fmt == "webp") && rows.exists(_.exp_fmt == "tiff"))
    rows.foreach { r =>
      val got = Multimodal.parseImageHeader(r.payload)
      if (r.valid == 1)
        assert(got.contains((r.exp_fmt, r.exp_width.get, r.exp_height.get)),
          s"media ${r.media_id} (${r.exp_fmt}): got $got")
      else
        assert(got.isEmpty, s"malformed media ${r.media_id} must be rejected, got $got")
    }
  }

  test("parseImageHeader: hand-built corner cases") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // minimal JPEG: SOI + SOF0 immediately (no APP0) — legal per T.81
    val sofOnly = bytes(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x11, 8, 0x01, 0x00,
      0x02, 0x00, 3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    assert(Multimodal.parseImageHeader(sofOnly).contains(("jpeg", 512, 256)))
    // fill bytes (FF FF FF) before a marker are legal padding
    val padded = bytes(0xff, 0xd8, 0xff, 0xff, 0xff, 0xc0, 0x00, 0x11, 8,
      0x00, 0x10, 0x00, 0x20, 3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    assert(Multimodal.parseImageHeader(padded).contains(("jpeg", 32, 16)))
    // C4 (DHT) is NOT a frame header even though it sits in C0–CF
    val dhtThenSos = bytes(0xff, 0xd8, 0xff, 0xc4, 0x00, 0x04, 0, 0,
      0xff, 0xda, 0x00, 0x02)
    assert(Multimodal.parseImageHeader(dhtThenSos).isEmpty)
    // marker desync (a segment length pointing into garbage) rejects
    assert(Multimodal.parseImageHeader(
      bytes(0xff, 0xd8, 0x00, 0xc0, 0x00, 0x11)).isEmpty)
    // BMP negative height = top-down; dims are absolute
    val rows = graft.fixtures.FixtureGen.mediaPayloads(40, seed = 9L)
    val bmps = rows.filter(_.exp_fmt == "bmp")
    assert(bmps.nonEmpty && bmps.forall(r =>
      Multimodal.parseImageHeader(r.payload)
        .contains(("bmp", r.exp_width.get, r.exp_height.get))))
    // truncation at every prefix length must reject or parse, never throw
    val png = rows.find(_.exp_fmt == "png").get.payload
    (0 until png.length).foreach { k =>
      Multimodal.parseImageHeader(java.util.Arrays.copyOf(png, k)): Unit
    }
    // BMP height Int.MinValue: abs() has no positive value — must reject
    val evil = bmps.head.payload.clone()
    evil(22) = 0x00; evil(23) = 0x00; evil(24) = 0x00; evil(25) = 0x80.toByte
    assert(Multimodal.parseImageHeader(evil).isEmpty)
    // a JPEG whose buffer ends exactly after the SOF width bytes parses
    // (the header was readable; pins the i+9 <= length bound)
    val atWidth = bytes(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x11, 8, 0x01, 0x00, 0x02, 0x00)
    assert(Multimodal.parseImageHeader(atWidth).contains(("jpeg", 512, 256)))
    // but a spec-impossible SOF length (< 11) rejects even with dims readable
    val shortSof = bytes(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x08, 8, 0x01, 0x00,
      0x02, 0x00, 0xff, 0xd9)
    assert(Multimodal.parseImageHeader(shortSof).isEmpty)
    // null payload rejects instead of NPE-ing
    assert(Multimodal.parseImageHeader(null).isEmpty)
  }

  test("parseImageHeader: WebP (VP8/VP8L/VP8X) and TIFF (II/MM) corner cases") {
    val rows = graft.fixtures.FixtureGen.mediaPayloads(60, seed = 1213L)
    val webps = rows.filter(_.exp_fmt == "webp")
    val tiffs = rows.filter(_.exp_fmt == "tiff")
    assert(webps.size >= 3 && tiffs.size >= 3, "all chunk/endian variants present")
    (webps ++ tiffs).foreach { r =>
      assert(Multimodal.parseImageHeader(r.payload)
        .contains((r.exp_fmt, r.exp_width.get, r.exp_height.get)),
        s"media ${r.media_id} (${r.exp_fmt})")
    }
    // truncation at every prefix length must reject or parse, never throw
    (webps.take(3) ++ tiffs.take(2)).foreach { r =>
      (0 until r.payload.length).foreach { k =>
        Multimodal.parseImageHeader(java.util.Arrays.copyOf(r.payload, k)): Unit
      }
    }
    // malformed fixture rows exercising the new rejection paths exist and reject
    val malformed = rows.filter(_.valid == 0)
    assert(malformed.exists(r => r.payload.length >= 12 &&
      new String(r.payload.slice(8, 12), "US-ASCII") == "WAVE"), "WAVE RIFF present")
    assert(malformed.forall(r => Multimodal.parseImageHeader(r.payload).isEmpty))
    // a TIFF IFD entry table truncated mid-entry rejects (bounds, not throw)
    val t = tiffs.head.payload
    assert(Multimodal.parseImageHeader(java.util.Arrays.copyOf(t, 12)).isEmpty)
    // all four (endianness × tag-type) combos present: the first entry's
    // type field sits at bytes 12-13 (magic 4 + ifd offset 4 + count 2 +
    // tag 2) — a fixture that only regenerated the (LE,SHORT)/(BE,LONG)
    // pair would leave two of the parser's TIFF paths unexercised.
    // Classic single-IFD rows only: BigTIFF has a different layout and
    // the thumbnail-first rows lead with tag 254 (the tag field sits at
    // bytes 10-11).
    val combos = graft.fixtures.FixtureGen.mediaPayloads(100, seed = 1213L)
      .filter(_.exp_fmt == "tiff").flatMap { r =>
        val p = r.payload
        val le = p(0) == 'I'.toByte
        def u16(i: Int) =
          if (le) (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
          else ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
        if (u16(2) != 42 || u16(10) == 254) None // BigTIFF / thumb-first
        else Some((le, u16(12)))
      }.toSet
    assert(combos == Set((true, 3), (true, 4), (false, 3), (false, 4)),
      s"TIFF endianness x type combos incomplete: $combos")
  }

  test("parseImageHeader: BigTIFF and thumbnail-first IFD chains") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // fixture rows: BigTIFF (both byte orders) and thumbnail-first TIFFs
    // recover the generator dims — for thumb-first that is the SECOND
    // (full-resolution) IFD's dims, which the generic valid-row loop in
    // the real-headers test already pins; here, pin the mechanisms
    val rows = graft.fixtures.FixtureGen.mediaPayloads(128, seed = 1213L)
    val bigs = rows.filter(r => r.exp_fmt == "tiff" && r.payload.length > 4 &&
      (r.payload(2) == 43 || r.payload(3) == 43))
    assert(bigs.size >= 2 && bigs.exists(_.payload(0) == 'I'.toByte) &&
      bigs.exists(_.payload(0) == 'M'.toByte), "both BigTIFF byte orders present")
    bigs.foreach(r => assert(Multimodal.parseImageHeader(r.payload)
      .contains(("tiff", r.exp_width.get, r.exp_height.get)), s"media ${r.media_id}"))
    // truncation fuzz over a BigTIFF payload: reject or parse, never throw
    (0 until bigs.head.payload.length).foreach { k =>
      Multimodal.parseImageHeader(
        java.util.Arrays.copyOf(bigs.head.payload, k)): Unit
    }
    // hand-built: first IFD reduced (tag 254 bit 0) with a full-res
    // second IFD 40x30 — the walk must skip the 5x4 thumbnail
    def le16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
    def le32(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    def entryS(tag: Int, v: Int) = le16(tag) ++ le16(3) ++ le32(1) ++ le16(v) ++ Seq(0, 0)
    def entryL(tag: Int, v: Int) = le16(tag) ++ le16(4) ++ le32(1) ++ le32(v)
    def ifd(sub: Int, w: Int, h: Int, next: Int) =
      le16(3) ++ entryL(254, sub) ++ entryS(256, w) ++ entryS(257, h) ++ le32(next)
    val thumbFirst = bytes((Seq('I'.toInt, 'I'.toInt) ++ le16(42) ++ le32(8) ++
      ifd(1, 5, 4, 8 + 42) ++ ifd(0, 40, 30, 0)): _*)
    assert(Multimodal.parseImageHeader(thumbFirst).contains(("tiff", 40, 30)))
    // first IFD reduced, chain ENDS: fall back to the thumbnail's dims —
    // a reduced image is still an image
    val thumbOnly = bytes((Seq('I'.toInt, 'I'.toInt) ++ le16(42) ++ le32(8) ++
      ifd(1, 5, 4, 0)): _*)
    assert(Multimodal.parseImageHeader(thumbOnly).contains(("tiff", 5, 4)))
    // count != 1 on a dimension tag: the value field holds a file
    // OFFSET, not the dimension — must reject, not misread (the
    // offset-as-width bug class)
    val countTwo = bytes((Seq('I'.toInt, 'I'.toInt) ++ le16(42) ++ le32(8) ++
      le16(2) ++ (le16(256) ++ le16(3) ++ le32(2) ++ le16(40) ++ Seq(0, 0)) ++
      entryS(257, 30) ++ le32(0)): _*)
    assert(Multimodal.parseImageHeader(countTwo).isEmpty)
    // a BAD second IFD (offset past the buffer) ends the walk; the
    // reduced first IFD's dims still come back as the fallback
    val badNext = bytes((Seq('I'.toInt, 'I'.toInt) ++ le16(42) ++ le32(8) ++
      ifd(1, 5, 4, 100000)): _*)
    assert(Multimodal.parseImageHeader(badNext).contains(("tiff", 5, 4)))
    // a self-pointing chain terminates (hop cap), yielding the fallback
    val selfLoop = bytes((Seq('I'.toInt, 'I'.toInt) ++ le16(42) ++ le32(8) ++
      ifd(1, 5, 4, 8)): _*)
    assert(Multimodal.parseImageHeader(selfLoop).contains(("tiff", 5, 4)))
  }

  test("decodePixels/boxResample: BMP and PNG pixels recover generator ground truth") {
    val rows = graft.fixtures.FixtureGen.mediaPayloads(500, seed = 1213L)
    val px = rows.filter(_.px_ok == 1)
    assert(px.size >= 50, s"pixel-true rows: ${px.size}")
    // all pixel row classes present: BMP up/down at both depths, PNG in
    // all four 8-bit color types (gray / truecolor / gray+alpha / RGBA)
    assert(px.count(_.exp_fmt == "bmp") >= 10 && px.count(_.exp_fmt == "png") >= 10)
    val bmpDepths = px.filter(_.exp_fmt == "bmp").map(r => r.payload(28) & 0xff).toSet
    assert(bmpDepths == Set(24, 32), s"BMP bit depths: $bmpDepths")
    val pngTypes = px.filter(_.exp_fmt == "png").map(r => r.payload(25) & 0xff).toSet
    assert(pngTypes == Set(0, 2, 4, 6), s"PNG color types: $pngTypes")
    px.foreach { r =>
      val img = Multimodal.decodePixels(r.payload)
      assert(img.isDefined, s"media ${r.media_id} (${r.exp_fmt}) must pixel-decode")
      val i = img.get
      assert(i.width == r.exp_width.get && i.height == r.exp_height.get)
      var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
      var k = 0
      while (k < i.rgb.length) {
        val rr = i.rgb(k) & 0xff; val gg = i.rgb(k + 1) & 0xff
        val bb = i.rgb(k + 2) & 0xff
        sr += rr; sg += gg; sb += bb
        sl += 299L * rr + 587L * gg + 114L * bb
        k += 3
      }
      assert(sr == r.px_sum_r.get && sg == r.px_sum_g.get &&
        sb == r.px_sum_b.get && sl == r.px_sum_luma.get,
        s"media ${r.media_id} (${r.exp_fmt}): channel sums diverge")
      val rz = Multimodal.boxResample(i, 8, 8)
      var cs = 0L
      rz.rgb.foreach(b => cs += (b & 0xff))
      assert(cs == r.rz_checksum.get,
        s"media ${r.media_id} (${r.exp_fmt}): resample checksum diverges")
    }
    // header-valid rows WITHOUT a real pixel array (filler payloads, the
    // corrupt-IDAT PNG) reject at the pixel tier instead of throwing
    val rejects = rows.filter(r => r.valid == 1 && r.px_ok == 0 &&
      (r.exp_fmt == "png" || r.exp_fmt == "bmp"))
    assert(rejects.nonEmpty)
    rejects.foreach(r => assert(Multimodal.decodePixels(r.payload).isEmpty,
      s"media ${r.media_id} (${r.exp_fmt}): no pixel array, must reject"))
    // truncation fuzz over one pixel-true payload of each format: the
    // chunk walk / pixel-array bounds must reject, never throw
    Seq(px.find(_.exp_fmt == "png").get, px.find(_.exp_fmt == "bmp").get)
      .foreach { r =>
        (0 until r.payload.length).foreach { k =>
          Multimodal.decodePixels(java.util.Arrays.copyOf(r.payload, k)): Unit
        }
      }
    // null payload rejects instead of NPE-ing
    assert(Multimodal.decodePixels(null).isEmpty)
  }

  test("decodePixels: a PNG whose zlib stream demands a preset dictionary rejects, not hangs") {
    // 0x78BB is a VALID zlib header ((0x78*256+0xBB) % 31 == 0) with the
    // FDICT bit (0x20) set: Inflater.inflate() returns 0 with
    // needsDictionary()==true, needsInput()==false, finished()==false.
    // A stall test of only `n == 0 && needsInput()` spins forever on
    // this one row — the decode must treat any 0-byte non-finished
    // inflate as unrecoverable and reject.
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Unit = { out.write(((v >> 24) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write((v & 0xff).toInt) }
    def chunk(typ: String, data: Array[Byte]): Unit = {
      u32(data.length.toLong); out.write(typ.getBytes("US-ASCII"))
      out.write(data); u32(0L) // CRC unchecked by the chunk walk
    }
    out.write(Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write(Array(0, 0, 0, 2, 0, 0, 0, 2).map(_.toByte)) // 2x2
    ihdr.write(Array(8, 0, 0, 0, 0).map(_.toByte)) // 8-bit grayscale
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", Array(0x78, 0xBB, 0x00, 0x00).map(_.toByte))
    chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.decodePixels(out.toByteArray).isEmpty,
      "FDICT zlib stream must reject at the pixel tier")
  }

  test("decodeImageMeta: null payloads become ok=0 rows; null ids are dropped") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = true),
      StructField("payload", BinaryType, nullable = true)))
    val png = graft.fixtures.FixtureGen.mediaPayloads(60, seed = 1213L)
      .find(_.exp_fmt == "png").get
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, png.payload),
        Row(2L, null), // null payload: reject as a typed row
        Row(null, png.payload))), // null id: dropped, not NPE
      schema)
    val got = Multimodal.decodeImageMeta(spark, df).collect().sortBy(_.media_id)
    assert(got.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(got(0).ok == 1 && got(0).fmt == "png")
    assert(got(1).ok == 0 && got(1).fmt == "unknown" && got(1).n_bytes == 0L)
  }

  test("decodeImageMeta: typed rejection rows ride through, ok flag queryable") {
    val rows = graft.fixtures.FixtureGen.mediaPayloads(60, seed = 1213L)
    val df = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[graft.fixtures.FixtureGen.MediaFixtureRow])
      .toDF()
    val got = Multimodal.decodeImageMeta(spark, df).collect()
    assert(got.length == 60, "malformed rows are rejected as rows, not dropped")
    val byId = got.map(m => m.media_id -> m).toMap
    rows.foreach { r =>
      val m = byId(r.media_id)
      assert(m.ok == r.valid && m.fmt == r.exp_fmt &&
        m.width == r.exp_width && m.height == r.exp_height &&
        m.n_bytes == r.payload.length.toLong)
    }
  }

  test("multimodal decodeMeta: real mapPartitions plumbing, deterministic stub values") {
    val df = Seq((7L, "abcdefghij")).toDF("doc_id", "text") // 10 bytes
    val meta = Multimodal.decodeMeta(spark, df).collect().head
    assert(meta.n_bytes == 10L)
    assert(meta.width == 64 + 10 % 577)
    assert(meta.height == 64 + (10 * 31) % 353)
    assert(meta.n_frames == 1 + 10 % 7)
    // schema is the typed product, not a blob
    assert(Multimodal.decodeMeta(spark, df).toDF().columns.toSeq ==
      Seq("doc_id", "n_bytes", "width", "height", "n_frames"))
  }

  test("frame sampling reassembles to the original payload") {
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("doc_id", "text") // 26 bytes, 5 frames
    val frames = Multimodal.sampleFrames(spark, df).collect().sortBy(_.frame_idx)
    assert(frames.length == 1 + 26 % 7)
    assert(frames.map(_.frame_len).sum == 26)
    assert(new String(frames.flatMap(_.frame), "UTF-8") == "abcdefghijklmnopqrstuvwxyz")
  }

  test("resize emits target dims and a bounded deterministic subsample") {
    val df = Seq((1L, "x" * 1000)).toDF("doc_id", "text")
    val r = Multimodal.resize(spark, df, 224, 224).collect().head
    assert((r.width, r.height) == (224, 224))
    assert(r.n_bytes == 1000L)
    assert(r.resized.length == 196) // 224*224/256, < n
    val r2 = Multimodal.resize(spark, df, 224, 224).collect().head
    assert(r.resized.toSeq == r2.resized.toSeq)
  }

  test("feature extraction emits normalized fixed-dim vectors") {
    val df = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, df).collect().head
    assert(feats.features.length == 16)
    assert(math.abs(feats.features.sum - 1.0f) < 1e-6)
    assert(feats.features(('a' & 0xFF) % 16) == 1.0f)
  }

  test("scrubPii replaces emails and phones with typed tokens and counts them") {
    val df = Seq(
      (1L, "hello bob@x.org and +1-555-0100 plus carol.smith@y.example.io end"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val got = TextAnalysis.scrubPii(df)
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val (e1, p1, clean1) = got(1L)
    assert(e1 == 2 && p1 == 1)
    assert(clean1 == "hello <EMAIL> and <PHONE> plus <EMAIL> end")
    assert(!clean1.contains("@") && !clean1.contains("555"))
    assert(got(2L) == ((0, 0, "no pii here at all")))
  }

  test("scrubPii audit counts equal emitted tokens when a phone hides inside an email") {
    // the email local part swallows the phone-shaped substring; the audit
    // must NOT report a <PHONE> redaction that never happened
    val df = Seq((1L, "reach a+1-555-0100@x.com ok")).toDF("doc_id", "text")
    val r = TextAnalysis.scrubPii(df).as[(Long, Int, Int, String)].collect().head
    assert(r == ((1L, 1, 0, "reach <EMAIL> ok")))
  }

  test("qualityClassifier: sigmoid of the weighted features, closed form") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val got = TextAnalysis.qualityClassifier(df)
      .select("quality_prob").as[Double].collect().head
    // 9 words, 2 stopwords ("the" x2), 8 distinct
    val z = -2.0 + 0.6 * math.log(1.0 + 9) + 1.5 * (2.0 / 9) + 0.8 * (8.0 / 9)
    assert(math.abs(got - 1.0 / (1.0 + math.exp(-z))) < 1e-12)
    assert(got > 0 && got < 1)
  }

  test("termWeights: TF-IDF and BM25 match the closed-form values") {
    // d1 = "a b a", d2 = "a c": N=2, dl=(3,2), avgdl=2.5, df(a)=2, df(b)=df(c)=1
    val df = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.termWeights(df)
      .select("doc_id", "term", "tf", "df", "dl", "tfidf", "bm25")
      .as[(Long, String, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet == Set((1L, "a"), (1L, "b"), (2L, "a"), (2L, "c")))
    def idf(df0: Double) = math.log(1.0 + (2.0 - df0 + 0.5) / (df0 + 0.5))
    def bm(tf: Double, df0: Double, dl: Double) =
      idf(df0) * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 2.5))
    val (_, _, tf1a, df1a, dl1a, tfidf1a, bm1a) = got((1L, "a"))
    assert((tf1a, df1a, dl1a) == ((2L, 2L, 3L)))
    assert(math.abs(tfidf1a - 2.0 * math.log(1.0 + 2.0 / 2.0)) < 1e-12)
    assert(math.abs(bm1a - bm(2, 2, 3)) < 1e-12)
    val (_, _, tf2c, df2c, dl2c, tfidf2c, bm2c) = got((2L, "c"))
    assert((tf2c, df2c, dl2c) == ((1L, 1L, 2L)))
    assert(math.abs(tfidf2c - 1.0 * math.log(1.0 + 2.0 / 1.0)) < 1e-12)
    assert(math.abs(bm2c - bm(1, 1, 2)) < 1e-12)
    // rarer terms always outweigh common ones at equal tf and dl
    assert(got((2L, "c"))._7 > got((2L, "a"))._7)
  }

  test("bigramLm: closed-form Laplace conditional probabilities on a toy corpus") {
    // corpus: "a b a b" + "b c"  -> bigrams: (a,b)x2, (b,a)x1, (b,c)x1
    // vocab V = {a,b,c} = 3; c(a)=2, c(b)=2 (as left context)
    val df = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLm(df, alpha = 1.0, minCount = 1L)
      .select("w1", "w2", "c12", "c1", "logp")
      .as[(String, String, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet == Set(("a", "b"), ("b", "a"), ("b", "c")))
    def lp(c12: Double, c1: Double) = math.log((c12 + 1.0) / (c1 + 3.0))
    assert(got(("a", "b"))._3 == 2L && got(("a", "b"))._4 == 2L)
    assert(math.abs(got(("a", "b"))._5 - BigDecimal(lp(2, 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(got(("b", "c"))._5 - BigDecimal(lp(1, 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // single-token docs contribute no bigrams but COUNT toward the vocab
    val withSingle = Seq((1L, "a b"), (2L, "z")).toDF("doc_id", "text")
    val one = TextAnalysis.bigramLm(withSingle, alpha = 1.0, minCount = 1L)
      .select("logp").as[Double].collect().head
    // V = {a,b,z} = 3: p = (1+1)/(1+3)
    assert(math.abs(one - BigDecimal(math.log(2.0 / 4.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("pmiCooccurrence: closed-form PMI, df cap drops hubs, minPairCount prunes") {
    // presence sets: the(1,2,3,4) a(1,2,3) b(1,2) c(3,4); N = 4
    // "the" has df 4 = N -> dropped by any cap < 1.0
    val df = Seq(
      (1L, "the a b"), (2L, "the b a a"), (3L, "the a c"), (4L, "the c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.pmiCooccurrence(df, maxDfFraction = 0.9, minPairCount = 1L)
      .as[(String, String, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c")), "hub 'the' must not pair")
    def pmi(cab: Double, d1: Double, d2: Double) = BigDecimal(
      math.log(cab * 4.0 / (d1 * d2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // (a,b): c=2, df(a)=3, df(b)=2; duplicate 'a' in doc 2 counts once
    assert(got(("a", "b"))._3 == 2L && got(("a", "b"))._4 == 3L && got(("a", "b"))._5 == 2L)
    assert(math.abs(got(("a", "b"))._6 - pmi(2, 3, 2)) < 1e-9)
    // (a,c): c=1 -> pmi ln(4/(3*2)) < 0 (anti-associated)
    assert(math.abs(got(("a", "c"))._6 - pmi(1, 3, 2)) < 1e-9)
    assert(got(("a", "c"))._6 < 0.0)
    // minPairCount = 2 prunes the singleton pair without touching the rest
    val cut = TextAnalysis.pmiCooccurrence(df, maxDfFraction = 0.9, minPairCount = 2L)
      .as[(String, String, Long, Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._6).toMap
    assert(cut.keySet == Set(("a", "b")))
    assert(cut(("a", "b")) == got(("a", "b"))._6)
  }

  test("bigramLm: minCount prunes rows without changing surviving probabilities") {
    val df = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    val all = TextAnalysis.bigramLm(df, minCount = 1L)
      .select("w1", "w2", "logp").as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val cut = TextAnalysis.bigramLm(df, minCount = 2L)
      .select("w1", "w2", "logp").as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(cut.keySet == Set(("a", "b")))
    assert(cut(("a", "b")) == all(("a", "b")))
  }

  test("normalize_text: NFC composes, NFKC folds compatibility, idempotent, null-safe") {
    import graft.core.GraftExtensions
    val df = Seq(
      Some("cafe\u0301"),    // decomposed: e + combining acute
      Some("caf\u00e9"),     // already composed
      Some("\ufb01le \uff21"), // ligature fi + full-width A
      None)
      .toDF("t")
    def norm(form: String) = df.select(
      GraftExtensions.normalizeText(spark, col("t"), form).as("n"))
      .as[Option[String]].collect().toSeq
    val nfc = norm("NFC")
    assert(nfc(0) == Some("caf\u00e9") && nfc(1) == Some("caf\u00e9"),
      "composed and decomposed inputs converge under NFC")
    assert(nfc(2) == Some("\ufb01le \uff21"), "NFC leaves compatibility forms alone")
    assert(nfc(3).isEmpty, "null passes through")
    val nfkc = norm("NFKC")
    assert(nfkc(2) == Some("file A"), "NFKC folds ligatures and full-width forms")
    // idempotence: a second pass changes nothing
    val twice = df.select(GraftExtensions.normalizeText(spark,
      GraftExtensions.normalizeText(spark, col("t"), "NFKC"), "NFKC").as("n"))
      .as[Option[String]].collect().toSeq
    assert(twice == nfkc)
    // dedup convergence: the exact-dedup key is identical post-NFC
    val keyed = Seq((1L, "cafe\u0301"), (2L, "caf\u00e9")).toDF("doc_id", "text")
      .select(md5(GraftExtensions.normalizeText(spark, col("text"), "NFC")).as("k"))
      .as[String].collect().toSet
    assert(keyed.size == 1, "normalization unifies dedup keys")
  }

  test("bpeMerges: closed-form merge order on the classic corpus") {
    // words (space-tokenized): low x5, lower x2, newest x6, widest x3.
    // Round 1 pair counts: (e,s)=9 ties (s,t)=9 -> lexicographic (e,s).
    // Round 2: (es,t)=9. Round 3: (l,o)=7 ties (o,w)=7 -> (l,o).
    val docs = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
      (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, numMerges = 3, minPairCount = 1L)
      .select("rank", "left", "right", "pair_count", "token")
      .as[(Int, String, String, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1, "e", "s", 9L, "es"),
      (2, "es", "t", 9L, "est"),
      (3, "l", "o", 7L, "lo")))
  }

  test("bpeMerges: greedy leftmost merging and the minPairCount stop") {
    // "aaa" x4 under (a,a): leftmost pair merges first -> ["aa","a"],
    // round 2 then sees (aa,a)=4
    val docs = Seq((1L, Seq.fill(4)("aaa").mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, numMerges = 5, minPairCount = 1L)
      .select("rank", "token", "pair_count").as[(Int, String, Long)].collect().sortBy(_._1)
    assert(got.head == ((1, "aa", 8L)), "4 words x 2 non-overlapping (a,a) pairs")
    assert(got(1) == ((2, "aaa", 4L)))
    assert(got.length == 2, "fully merged words stop the induction")
    // a high floor stops immediately
    val stopped = TextAnalysis.bpeMerges(docs, numMerges = 5, minPairCount = 100L)
    assert(stopped.count() == 0L)
  }

  test("bpeMerges: local endgame ≡ distributed loop, byte-identical merge table") {
    // the path gate (localFinishMaxSyms) must be invisible in the
    // output: same corpus and settings as the oracle-gated
    // ext_bpe_merges query, forced down each path
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    def table(maxSyms: Long): Seq[(Int, String, String, Long, String)] =
      TextAnalysis.bpeMerges(docs, numMerges = 20, minPairCount = 2L,
        localFinishMaxSyms = maxSyms)
        .select("rank", "left", "right", "pair_count", "token")
        .as[(Int, String, String, Long, String)].collect().sortBy(_._1).toSeq
    val local = table(Long.MaxValue)
    val dist = table(0L)
    assert(local.size == 20, "fixture must sustain all 20 merges")
    assert(local == dist, "local and distributed merge tables must be byte-identical")
  }

  test("bpeMerges: mid-train hop to the local endgame leaves the table unchanged") {
    // a corpus entering JUST ABOVE the gate starts distributed, then
    // crosses under at the first checkpoint (merges strictly shrink the
    // symbol mass) and hops to the driver loop — ranks continue, table
    // byte-identical to both pure paths
    val rnd = new scala.util.Random(777L)
    val docsSeq = (1L to 30L).map { id =>
      val ws = Seq.fill(4 + rnd.nextInt(6))(
        Seq.fill(1 + rnd.nextInt(8))("abcd"(rnd.nextInt(4))).mkString)
      (id, ws.mkString(" "))
    }
    val docs = docsSeq.toDF("doc_id", "text")
    // symbol mass = total chars over DISTINCT words (letters-only corpus,
    // so the tokenizer splits exactly on spaces)
    val mass = docsSeq.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .distinct.map(_.length.toLong).sum
    def table(maxSyms: Long): Seq[(Int, String, String, Long, String)] =
      TextAnalysis.bpeMerges(docs, numMerges = 12, minPairCount = 1L,
        localFinishMaxSyms = maxSyms)
        .select("rank", "left", "right", "pair_count", "token")
        .as[(Int, String, String, Long, String)].collect().sortBy(_._1).toSeq
    val hopped = table(mass - 1)
    assert(hopped.size == 12, "fixture must sustain all 12 merges")
    assert(hopped == table(0L), "hopped path diverged from pure distributed")
    assert(hopped == table(Long.MaxValue), "hopped path diverged from pure local")
  }

  test("bpeMerges: local ≡ distributed on tie-dense random corpora") {
    // 3-letter alphabet = maximal tie and chained-merge density (merged
    // tokens immediately re-collide with singles) — the adversarial
    // input for argmax ordering and the greedy rewrite; seeded, so the
    // pin is reproducible
    val rnd = new scala.util.Random(4242L)
    (1 to 4).foreach { trial =>
      val docs = (1L to 20L).map { id =>
        val words = Seq.fill(3 + rnd.nextInt(6))(
          Seq.fill(1 + rnd.nextInt(7))("abc" (rnd.nextInt(3))).mkString)
        (id, words.mkString(" "))
      }.toDF("doc_id", "text")
      def table(maxSyms: Long): Seq[(Int, String, String, Long, String)] =
        TextAnalysis.bpeMerges(docs, numMerges = 10, minPairCount = 1L,
          localFinishMaxSyms = maxSyms)
          .select("rank", "left", "right", "pair_count", "token")
          .as[(Int, String, String, Long, String)].collect().sortBy(_._1).toSeq
      assert(table(Long.MaxValue) == table(0L), s"trial $trial diverged")
    }
  }

  test("bpeEncode: mapPartitions fast tier ≡ the Column chain on a deep table") {
    // a 100-merge table (past the 64-merge chain gate) learned from the
    // dense tie-heavy corpus; the same docs encoded through both tiers
    // must token-match exactly, word boundaries and all
    val rnd = new scala.util.Random(77L)
    val docs = (1L to 30L).map { id =>
      (id, Seq.fill(4 + rnd.nextInt(5))(
        Seq.fill(2 + rnd.nextInt(9))("abcd" (rnd.nextInt(4))).mkString)
        .mkString(" "))
    }.toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, numMerges = 100, minPairCount = 1L)
    assert(merges.count() > 64, "table must be deep enough to cross the gate")
    def enc(maxChain: Int): Map[Long, Seq[String]] =
      TextAnalysis.bpeEncode(docs, merges, maxChainMerges = maxChain)
        .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    val fast = enc(64)          // default gate -> mapPartitions tier
    val chain = enc(Int.MaxValue) // forced Column-chain tier
    assert(fast == chain)
    // lossless on both tiers
    fast.foreach { case (id, toks) =>
      val squeezed = docs.filter($"doc_id" === id)
        .select(regexp_replace($"text", " ", "")).as[String].head()
      assert(toks.mkString == squeezed)
    }
  }

  test("bpeMerges: argmax tie-break is UTF-8 byte order on BOTH paths") {
    // U+E000 is one UTF-16 code unit (0xE000) but three UTF-8 bytes
    // (EE 80 80); U+1F600 is a surrogate pair starting 0xD83D but four
    // UTF-8 bytes (F0 9F 98 80). Java's String ordering puts the
    // surrogate FIRST (0xD83D < 0xE000) while Spark's UTF8String binary
    // compare puts U+E000 first — a tie broken with compareTo would
    // diverge between the local and distributed paths exactly here.
    val smiley = new String(Character.toChars(0x1F600))
    val docs = Seq((1L, "\ue000a"), (2L, smiley + "a")).toDF("doc_id", "text")
    def first(maxSyms: Long): (String, String) =
      TextAnalysis.bpeMerges(docs, numMerges = 1, minPairCount = 1L,
        localFinishMaxSyms = maxSyms)
        .select("left", "right").as[(String, String)].collect().head
    assert(first(Long.MaxValue) == (("\ue000", "a")))
    assert(first(0L) == (("\ue000", "a")))
  }

  test("bpeEncode: replays the merge table in rank order, word boundaries are hard") {
    val docs = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
      (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, numMerges = 3, minPairCount = 1L)
    val enc = TextAnalysis.bpeEncode(
      Seq((7L, "lowest newest")).toDF("doc_id", "text"), merges)
      .select("tokens", "n_tokens").as[(Seq[String], Long)].collect().head
    // merges learned: es, est, lo -> lowest = [lo w est], newest = [n e w est]
    assert(enc._1 == Seq("lo", "w", "est", "n", "e", "w", "est"))
    assert(enc._2 == 7L)
    // tokenization is lossless: concatenating tokens restores the
    // original non-space characters
    assert(enc._1.mkString == "lowest newest".replace(" ", ""))
    // "any compatible (rank, left, right) frame": a merge table
    // round-tripped with a BIGINT rank and a non-identifier text column
    // must encode identically
    val longRank = merges.select(col("rank").cast("long").as("rank"),
      col("left"), col("right"))
    val enc2 = TextAnalysis.bpeEncode(
      Seq((7L, "lowest newest")).toDF("doc_id", "doc text"),
      longRank, textCol = "doc text")
      .select("tokens").as[Seq[String]].collect().head
    assert(enc2 == enc._1)
  }

  test("invertedIndex: numeric-sorted postings, true df, maxPostings truncation") {
    val df = Seq((10L, "x y"), (2L, "x"), (1L, "x x")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(df)
      .select("term", "df", "postings").as[(String, Long, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // numeric order (1,2,10), not lexicographic ("1","10","2");
    // doc 1's repeated "x" counted once
    assert(got("x") == (3L, "1,2,10"))
    assert(got("y") == (1L, "10"))
    val capped = TextAnalysis.invertedIndex(df, maxPostings = 2)
      .select("term", "df", "postings").as[(String, Long, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(capped("x") == (3L, "1,2"), "df stays true while the list truncates")
  }
}
