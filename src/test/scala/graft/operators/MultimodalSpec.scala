package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val payloads = Seq(("img1", "abcd"), ("img2", "abcdef"))
    .toDF("id", "raw").withColumn("payload", col("raw").cast("binary")).drop("raw")

  test("decodeImageMeta appends a typed meta struct, preserves rows and columns") {
    val got = Multimodal.decodeImageMeta(payloads, "payload")
    assert(got.count() === 2)
    assert(got.columns.toSeq === Seq("id", "payload", "meta"))
    val metas = got.orderBy("id").select("meta.width", "meta.height", "meta.format")
      .as[(Int, Int, String)].collect()
    // deterministic fake: width=64+n%512, height=64+31n%512, format by parity
    assert(metas(0) === ((68, 188, "png")))
    assert(metas(1) === ((70, 250, "png")))
  }

  test("decodeImageMeta is deterministic across runs") {
    def run() = Multimodal.decodeImageMeta(payloads, "payload")
      .orderBy("id").select("id", "meta.width", "meta.height", "meta.format")
      .as[(String, Int, Int, String)].collect().toSeq
    assert(run() === run())
  }

  test("BMP payloads take the REAL header-parse branch of the codec chain") {
    // hand-assemble a minimal BMP header: 'BM', DIB size 40
    // (BITMAPINFOHEADER) at offset 14, int32-LE width=640 at offset 18,
    // height=-480 at offset 22 (negative = top-down; decoded dimension
    // is the magnitude)
    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'
    def putLe(o: Int, v: Int): Unit = (0 until 4).foreach(i => bmp(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    putLe(14, 40); putLe(18, 640); putLe(22, -480)
    val df = Seq(("bmp1", bmp)).toDF("id", "payload")
    val meta = Multimodal.decodeImageMeta(df, "payload")
      .select("meta.width", "meta.height", "meta.format")
      .as[(Int, Int, String)].head()
    assert(meta === ((640, 480, "bmp")))
    // direct codec unit check too (no Spark in the loop)
    assert(Multimodal.BmpCodec.decode(bmp) === Some((640, 480, "bmp")))
    assert(Multimodal.BmpCodec.decode("not a bmp".getBytes) === None)
  }

  test("OS/2 BITMAPCOREHEADER BMPs decode their uint16 dims, unknown DIBs fall through") {
    // COREHEADER: DIB size 12, uint16-LE dims at offsets 18/20
    val core = new Array[Byte](22)
    core(0) = 'B'; core(1) = 'M'; core(14) = 12
    core(18) = 0x20; core(19) = 0x00 // width 32
    core(20) = 0x10; core(21) = 0x00 // height 16
    assert(Multimodal.BmpCodec.decode(core) === Some((32, 16, "bmp")))
    // 'BM' magic with a bogus DIB size must NOT be trusted at 18/22
    val bogus = core.clone(); bogus(14) = 99
    assert(Multimodal.BmpCodec.decode(bogus) === None)
  }

  test("PNG signature with a non-IHDR first chunk is rejected, not misparsed") {
    val fake = new Array[Byte](24)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    sig.indices.foreach(i => fake(i) = sig(i).toByte)
    fake(12) = 'a'; fake(13) = 'c'; fake(14) = 'T'; fake(15) = 'L'
    assert(Multimodal.PngCodec.decode(fake) === None)
  }

  test("JPEG payloads: marker walk finds SOF dims past leading segments") {
    // SOI, APP0 (len 16), then SOF0 with height=480 width=640
    val app0Len = 16
    val jpg = new Array[Byte](2 + 2 + app0Len + 2 + 2 + 6)
    var i = 0
    def put(vs: Int*): Unit = vs.foreach { v => jpg(i) = v.toByte; i += 1 }
    put(0xff, 0xd8)                      // SOI
    put(0xff, 0xe0, 0x00, app0Len)       // APP0 marker + BE16 length
    i += app0Len - 2                     // APP0 body
    put(0xff, 0xc0, 0x00, 0x0b)          // SOF0 + length 11
    put(0x08)                            // precision
    put(0x01, 0xe0)                      // height 480
    put(0x02, 0x80)                      // width 640
    put(0x01)                            // components
    assert(Multimodal.JpegCodec.decode(jpg) === Some((640, 480, "jpeg")))
    assert(Multimodal.JpegCodec.decode("not a jpeg".getBytes) === None)
    // truncated stream (SOI only) falls through rather than guessing
    assert(Multimodal.JpegCodec.decode(Array(0xff, 0xd8).map(_.toByte)) === None)
  }

  test("GIF payloads decode logical-screen dims from the fixed header") {
    val gif = "GIF89a".getBytes("US-ASCII") ++ Array[Byte](
      0x40, 0x01, // width 320 LE
      0xf0.toByte, 0x00, // height 240 LE
      0x00)
    assert(Multimodal.GifCodec.decode(gif) === Some((320, 240, "gif")))
    assert(Multimodal.GifCodec.decode("GIF99a0000".getBytes) === None)
  }

  test("PNG payloads take the REAL header-parse branch of the codec chain") {
    // PNG signature + IHDR length/type + int32-BE width=123, height=77
    val png = new Array[Byte](24)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    sig.indices.foreach(i => png(i) = sig(i).toByte)
    def putBe(o: Int, v: Int): Unit = (0 until 4).foreach(i => png(o + i) = ((v >> (8 * (3 - i))) & 0xff).toByte)
    putBe(8, 13); png(12) = 'I'; png(13) = 'H'; png(14) = 'D'; png(15) = 'R'
    putBe(16, 123); putBe(20, 77)
    val df = Seq(("png1", png)).toDF("id", "payload")
    val meta = Multimodal.decodeImageMeta(df, "payload")
      .select("meta.width", "meta.height", "meta.format")
      .as[(Int, Int, String)].head()
    assert(meta === ((123, 77, "png")))
    assert(Multimodal.PngCodec.decode(png) === Some((123, 77, "png")))
    assert(Multimodal.PngCodec.decode("plain text".getBytes) === None)
  }

  test("non-image payloads fall through the chain to the stub tail") {
    // text bytes match no real codec's magic — identical results to the
    // pre-chain stub, which is what q36's oracle arithmetic replays
    val got = Multimodal.decodeImageMeta(payloads, "payload")
      .orderBy("id").select("meta.width", "meta.height", "meta.format")
      .as[(Int, Int, String)].collect()
    assert(got(0) === ((68, 188, "png")))
    assert(Multimodal.StubCodec.decode("abcd".getBytes) === Some((68, 188, "png")))
  }

  test("resizeImage replaces the payload in place and appends target meta") {
    val got = Multimodal.resizeImage(payloads, "payload", w = 32, h = 32)
    assert(got.columns.toSeq === Seq("id", "payload", "resized_meta"))
    val rows = got.orderBy("id")
      .select(length(col("payload")), col("resized_meta.width"), col("resized_meta.height"))
      .as[(Int, Int, Int)].collect()
    // stub halves the byte length; meta carries the requested dims
    assert(rows.toSeq === Seq((2, 32, 32), (3, 32, 32)))
  }

  /** A 4×2 uncompressed 24bpp BMP whose pixel (x, y in storage order)
    * carries BGR = (x, y, x+y) — nearest-neighbor picks are then
    * checkable by value. Row stride = 12 (4 px × 3 B, already 4-aligned). */
  private def bmp4x2: Array[Byte] = {
    val stride = 12
    val b = new Array[Byte](54 + stride * 2)
    def putLe16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def putLe32(o: Int, v: Int): Unit =
      (0 until 4).foreach(i => b(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    b(0) = 'B'; b(1) = 'M'
    putLe32(2, b.length); putLe32(10, 54); putLe32(14, 40)
    putLe32(18, 4); putLe32(22, 2); putLe16(26, 1); putLe16(28, 24)
    putLe32(30, 0); putLe32(34, stride * 2)
    for (y <- 0 until 2; x <- 0 until 4) {
      val o = 54 + y * stride + x * 3
      b(o) = x.toByte; b(o + 1) = y.toByte; b(o + 2) = (x + y).toByte
    }
    b
  }

  test("resizeImage REALLY downscales a 24bpp BMP (valid output, exact pixels)") {
    val df = Seq(("b1", bmp4x2)).toDF("id", "payload")
    val out = Multimodal.resizeImage(df, "payload", w = 2, h = 1)
      .select("payload", "resized_meta.format").as[(Array[Byte], String)].head()
    assert(out._2 === "bmp")
    // the resized payload is itself a decodable BMP with the target dims
    val img = Multimodal.readImage(out._1).get
    assert((img.getWidth, img.getHeight) === ((2, 1)))
    // nearest-neighbor in image coordinates: out x=0 ← src x=0,
    // out x=1 ← src x=2, out y=0 ← src image row 0 = STORAGE row 1 of
    // the bottom-up source (pixel (x, y=1) carries BGR=(x, 1, x+1),
    // i.e. RGB=(x+1, 1, x)); BMP round-trips losslessly
    def rgb(p: Int) = ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
    assert(rgb(img.getRGB(0, 0)) === ((1, 1, 0)))
    assert(rgb(img.getRGB(1, 0)) === ((3, 1, 2)))
  }

  /** Encode a solid-color 8×4 image in `fmt` via the JDK's own writers —
    * real PNG/JPEG/GIF/BMP payloads without any fixture files. */
  private def solidImage(fmt: String, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8) img.setRGB(x, y, (r << 16) | (g << 8) | b)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK must write $fmt")
    bos.toByteArray
  }

  test("resizeImage is REAL for all four JDK formats (png/jpeg/gif/bmp)") {
    for (fmt <- Seq("png", "jpeg", "gif", "bmp")) {
      val df = Seq((fmt, solidImage(fmt, 100, 150, 200))).toDF("id", "payload")
      val out = Multimodal.resizeImage(df, "payload", w = 3, h = 2)
        .select("payload", "resized_meta.format").as[(Array[Byte], String)].head()
      assert(out._2 === fmt, s"resize re-encodes into the input container ($fmt)")
      val img = Multimodal.readImage(out._1).get
      assert((img.getWidth, img.getHeight) === ((3, 2)), fmt)
      // solid color survives resample+re-encode (JPEG within lossy noise)
      val p = img.getRGB(1, 1)
      val tol = if (fmt == "jpeg") 8 else 0
      assert(math.abs(((p >> 16) & 0xff) - 100) <= tol, s"$fmt red")
      assert(math.abs(((p >> 8) & 0xff) - 150) <= tol, s"$fmt green")
      assert(math.abs((p & 0xff) - 200) <= tol, s"$fmt blue")
    }
  }

  test("decodePixelStats: REAL channel means for all four formats, NULL for non-images") {
    val rows = Seq("png", "jpeg", "gif", "bmp")
      .map(f => (f, solidImage(f, 10, 20, 30))) :+ (("txt", "not an image".getBytes))
    val df = rows.toDF("id", "payload")
    val got = Multimodal.decodePixelStats(df, "payload")
    assert(got.columns.toSeq === Seq("id", "payload", "pixel_stats"))
    val stats = got.select("id", "pixel_stats.width", "pixel_stats.height",
        "pixel_stats.mean_r", "pixel_stats.mean_g", "pixel_stats.mean_b")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(stats("txt").isNullAt(1), "non-image payloads get a NULL struct")
    for (fmt <- Seq("png", "gif", "bmp")) {
      val r = stats(fmt)
      assert((r.getInt(1), r.getInt(2)) === ((8, 4)), fmt)
      assert((r.getDouble(3), r.getDouble(4), r.getDouble(5)) === ((10.0, 20.0, 30.0)), fmt)
    }
    val j = stats("jpeg") // lossy: means near, not exact
    assert(math.abs(j.getDouble(3) - 10.0) <= 8 && math.abs(j.getDouble(5) - 30.0) <= 8)
  }

  test("sampleFrames fans out one row per sampled frame") {
    val got = Multimodal.sampleFrames(payloads, "payload", everyNth = 2)
    // n_frames = len%240+1 → abcd:5, abcdef:7 → frames sampled: ceil(5/2)=3, ceil(7/2)=4
    assert(got.count() === 3 + 4)
    assert(got.columns.contains("frame_offset"))
  }

  /** A syntactically valid 2-frame GIF89a: header + LSD (no global color
    * table), a graphic-control extension per frame, two image
    * descriptors each with a 1-byte LZW stream, trailer. */
  private def gif2Frames: Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= "GIF89a".getBytes("US-ASCII")
    out ++= Array[Byte](2, 0, 2, 0, 0, 0, 0) // LSD: 2×2, no GCT
    for (_ <- 0 until 2) {
      out ++= Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0) // GCE: 4-byte block + term
      out ++= Array[Byte](0x2c, 0, 0, 0, 0, 2, 0, 2, 0, 0)     // image descriptor, no LCT
      out ++= Array[Byte](2, 1, 0x42, 0)                       // LZW min + 1 sub-block + term
    }
    out += 0x3b
    out.toArray
  }

  test("sampleFrames counts REAL frames for animated GIFs") {
    assert(Multimodal.gifFrameCount(gif2Frames) === Some(2))
    assert(Multimodal.gifFrameCount("not a gif".getBytes) === None)
    // truncated mid-descriptor → None, not a bogus count
    assert(Multimodal.gifFrameCount(gif2Frames.dropRight(8)) === None)
    val df = Seq(("g1", gif2Frames)).toDF("id", "payload")
    val got = Multimodal.sampleFrames(df, "payload", everyNth = 1)
    // 2 real frames, sampled every 1 → exactly 2 rows, offsets 0 and 1
    assert(got.count() === 2)
    import spark.implicits._
    assert(got.select("frame_offset").as[Long].collect().sorted.toSeq === Seq(0L, 1L))
    assert(got.select("n_frames").distinct().as[Int].head() === 2)
  }

  /** A canonical 44-byte-header PCM WAV: stereo, 44.1 kHz, 16-bit,
    * 1 second of (zeroed) samples → data size 176400, byte rate 176400. */
  private def wav1s: Array[Byte] = {
    val dataSize = 176400
    val b = new Array[Byte](44 + 8) // declared data size > stored bytes: truncated tail
    def putLe16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def putLe32(o: Int, v: Int): Unit =
      (0 until 4).foreach(i => b(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    def putTag(o: Int, s: String): Unit = s.getBytes("US-ASCII").zipWithIndex
      .foreach { case (c, i) => b(o + i) = c }
    putTag(0, "RIFF"); putLe32(4, 36 + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 16)
    putLe16(20, 1)       // PCM
    putLe16(22, 2)       // channels
    putLe32(24, 44100)   // sample rate
    putLe32(28, 176400)  // byte rate
    putLe16(32, 4)       // block align
    putLe16(34, 16)      // bits per sample
    putTag(36, "data"); putLe32(40, dataSize)
    b
  }

  test("WAV payloads take the REAL RIFF chunk walk: fmt + data → meta") {
    assert(Multimodal.WavCodec.decode(wav1s) === Some((2, 44100, 16, 1000L, "wav")))
    // non-RIFF and RIFF-but-not-WAVE both fall through
    assert(Multimodal.WavCodec.decode("not audio at all".getBytes) === None)
    val avi = wav1s; avi(8) = 'A'; avi(9) = 'V'; avi(10) = 'I'; avi(11) = ' '
    assert(Multimodal.WavCodec.decode(avi) === None)
    // missing data chunk (walk ends after fmt) falls through
    assert(Multimodal.WavCodec.decode(wav1s.take(36)) === None)
  }

  test("decodeAudioMeta appends a typed struct; text payloads hit the stub tail") {
    val df = Seq(("a1", wav1s), ("a2", "abcd".getBytes)).toDF("id", "payload")
    val got = Multimodal.decodeAudioMeta(df, "payload")
    assert(got.columns.toSeq === Seq("id", "payload", "audio_meta"))
    val metas = got.orderBy("id")
      .select("audio_meta.channels", "audio_meta.sample_rate",
        "audio_meta.bits_per_sample", "audio_meta.duration_ms", "audio_meta.format")
      .as[(Int, Int, Int, Long, String)].collect()
    assert(metas(0) === ((2, 44100, 16, 1000L, "wav")))
    // stub arithmetic on n=4: channels 1+0, rate 8000+4*8000, 16 bit, (4%600)*1000
    assert(metas(1) === ((1, 40000, 16, 4000L, "mp3")))
  }

  /** A minimal ISO-BMFF MP4: ftyp, then moov{mvhd v0 (timescale 600,
    * duration 9000 → 15 s), trak{tkhd v0 (640×360 as 16.16 fixed)}}. */
  private def mp4Min: Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def be32(v: Int): Seq[Byte] = (3 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte)
    def box(tpe: String, payload: Seq[Byte]): Seq[Byte] =
      be32(8 + payload.size) ++ tpe.getBytes("US-ASCII") ++ payload
    val mvhd = box("mvhd",
      Seq[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(600) ++ be32(9000) ++
        Seq.fill(80)(0.toByte))
    val tkhd = box("tkhd",
      Seq[Byte](0, 0, 0, 0) ++ Seq.fill(72)(0.toByte) ++
        be32(640 << 16) ++ be32(360 << 16))
    out ++= box("ftyp", "isom".getBytes("US-ASCII").toSeq ++ be32(512))
    out ++= box("moov", mvhd ++ box("trak", tkhd))
    out.toArray
  }

  test("MP4 payloads take the REAL box walk: mvhd duration + tkhd dims") {
    assert(Multimodal.Mp4Codec.decode(mp4Min) === Some((640, 360, 15000L, "mp4")))
    // not starting with ftyp → not an MP4, fall through
    assert(Multimodal.Mp4Codec.decode("certainly not a video".getBytes) === None)
    // ftyp but no moov (truncated upload) falls through, no bogus meta
    assert(Multimodal.Mp4Codec.decode(mp4Min.take(16)) === None)
  }

  /** Ogg page: 'OggS' header with the given granule + one payload
    * segment. */
  private def oggPage(granule: Long, payload: Seq[Byte]): Seq[Byte] = {
    val h = scala.collection.mutable.ArrayBuffer.empty[Byte]
    h ++= "OggS".getBytes("US-ASCII")
    h ++= Seq[Byte](0, 0) // version, header type
    h ++= (0 to 7).map(i => ((granule >> (8 * i)) & 0xff).toByte)
    h ++= Array.fill[Byte](12)(0) // serial, seq, checksum
    h += 1.toByte // one segment
    h += payload.size.toByte
    (h ++ payload).toSeq
  }

  test("Ogg Vorbis/Opus id headers + last-page granule give real audio meta") {
    val vorbisId = Seq(0x01.toByte) ++ "vorbis".getBytes("US-ASCII").toSeq ++
      Seq[Byte](0, 0, 0, 0) ++ // version u32
      Seq(2.toByte) ++ // channels
      (0 to 3).map(i => ((44100 >> (8 * i)) & 0xff).toByte) // rate LE
    // id page (granule 0) + a final data page at granule 441000 → 10 s
    val ogg = (oggPage(0L, vorbisId) ++ oggPage(441000L, Seq(0x55.toByte))).toArray
    assert(Multimodal.OggCodec.decode(ogg) === Some((2, 44100, 0, 10000L, "vorbis")))
    val opusId = "OpusHead".getBytes("US-ASCII").toSeq ++
      Seq[Byte](1, 1) ++ Seq[Byte](0, 0) ++ // version, 1 channel, pre-skip
      (0 to 3).map(i => ((48000 >> (8 * i)) & 0xff).toByte)
    // Opus granules are 48 kHz regardless of input rate: 96000 → 2 s
    val opus = (oggPage(0L, opusId) ++ oggPage(96000L, Seq(0x55.toByte))).toArray
    assert(Multimodal.OggCodec.decode(opus) === Some((1, 48000, 0, 2000L, "opus")))
    // a lone id page (granule 0 / unfinished -1) reports duration 0
    val lone = oggPage(0L, vorbisId).toArray
    assert(Multimodal.OggCodec.decode(lone) === Some((2, 44100, 0, 0L, "vorbis")))
    // non-audio Ogg (e.g. Theora-first) and non-Ogg fall through
    val theora = (oggPage(0L, Seq(0x80.toByte) ++ "theora".getBytes("US-ASCII").toSeq ++
      Array.fill[Byte](10)(0))).toArray
    assert(Multimodal.OggCodec.decode(theora) === None)
    assert(Multimodal.OggCodec.decode("OggX not really".getBytes) === None)
  }

  test("AAC ADTS frame walk counts samples for the exact duration") {
    // header: FFF1 (MPEG-4, layer 0, no CRC), rate idx 4 (44100),
    // channel cfg 2; frame length packed into b3..b5
    def frame(len: Int): Array[Byte] = {
      val h = Array(0xff.toByte, 0xf1.toByte,
        ((4 << 2) | 0).toByte, // profile 0, rate idx 4, private 0, chan hi 0
        ((2 << 6) | ((len >> 11) & 0x3)).toByte,
        ((len >> 3) & 0xff).toByte,
        (((len & 0x7) << 5) | 0x1f).toByte,
        0xfc.toByte)
      h ++ Array.fill[Byte](len - 7)(0x21)
    }
    // 43 frames × 1024 samples at 44.1 kHz → 43*1024*1000/44100 ms
    val stream = (1 to 43).flatMap(_ => frame(321)).toArray
    assert(Multimodal.AacAdtsCodec.decode(stream) ===
      Some((2, 44100, 0, 43L * 1024 * 1000 / 44100, "aac")))
    // truncated tail: counted frames still report
    assert(Multimodal.AacAdtsCodec.decode(stream.take(321 * 10 + 50)).map(_._4) ===
      Some(10L * 1024 * 1000 / 44100))
    // an ID3v2 tag ahead of the frames is skipped, like MP3
    val tagged = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 50) ++
      Array.fill[Byte](50)(0) ++ stream
    assert(Multimodal.AacAdtsCodec.decode(tagged) ===
      Some((2, 44100, 0, 43L * 1024 * 1000 / 44100, "aac")))
    // an MP3 Layer III frame is NOT claimed (layer bits ≠ 0) and
    // vice versa — the two syncs stay disjoint in the chain
    assert(Multimodal.AacAdtsCodec.decode(mp3Min.drop(110)) === None)
    assert(Multimodal.Mp3Codec.decode(stream) === None)
    assert(Multimodal.AacAdtsCodec.decode("not audio at all".getBytes) === None)
  }

  /** Minimal AVI: RIFF 'AVI ' + LIST/hdrl/avih (25 fps × 250 frames,
    * 640×480 → 10 s). */
  private def aviMin: Array[Byte] = {
    def le(v: Long, n: Int): Seq[Byte] = (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte)
    val avih = "avih".getBytes("US-ASCII").toSeq ++ le(56, 4) ++
      le(40000, 4) ++ le(0, 4) ++ le(0, 4) ++ le(0, 4) ++ // µs/frame, maxbytes, pad, flags
      le(250, 4) ++ le(0, 4) ++ le(1, 4) ++ le(0, 4) ++ // frames, initial, streams, bufsize
      le(640, 4) ++ le(480, 4) ++ Seq.fill(16)(0.toByte) // width, height, reserved
    val hdrl = "LIST".getBytes("US-ASCII").toSeq ++ le(4 + avih.size, 4) ++
      "hdrl".getBytes("US-ASCII").toSeq ++ avih
    ("RIFF".getBytes("US-ASCII").toSeq ++ le(4 + hdrl.size, 4) ++
      "AVI ".getBytes("US-ASCII").toSeq ++ hdrl).toArray
  }

  test("AVI avih header decodes dims + frame-count duration") {
    assert(Multimodal.AviCodec.decode(aviMin) === Some((640, 480, 10000L, "avi")))
    // WAV shares the RIFF magic but not the AVI form type
    val wavish = "RIFFxxxxWAVE".getBytes ++ Array.fill[Byte](40)(0)
    assert(Multimodal.AviCodec.decode(wavish) === None)
    assert(Multimodal.AviCodec.decode(aviMin.take(30)) === None)
  }

  /** Minimal WebM: EBML header, Segment{Info{TimestampScale 1e6,
    * Duration 30000f}, Tracks{TrackEntry{Video{1280×720}}}}. */
  private def webmMin(segmentUnknownSize: Boolean = false): Array[Byte] = {
    def idb(bytes: Int*): Seq[Byte] = bytes.map(_.toByte)
    def el(id: Seq[Byte], p: Seq[Byte]): Seq[Byte] =
      id ++ Seq((0x80 | p.size).toByte) ++ p
    val ebml = el(idb(0x1A, 0x45, 0xDF, 0xA3), Nil)
    val tscale = el(idb(0x2A, 0xD7, 0xB1), idb(0x0F, 0x42, 0x40)) // 1,000,000 ns
    val durBits = java.lang.Float.floatToIntBits(30000f)
    val dur = el(idb(0x44, 0x89),
      (3 to 0 by -1).map(i => ((durBits >> (8 * i)) & 0xff).toByte))
    val info = el(idb(0x15, 0x49, 0xA9, 0x66), tscale ++ dur)
    val video = el(idb(0xE0),
      el(idb(0xB0), idb(0x05, 0x00)) ++ el(idb(0xBA), idb(0x02, 0xD0)))
    val tracks = el(idb(0x16, 0x54, 0xAE, 0x6B), el(idb(0xAE), video))
    val segBody = info ++ tracks
    val seg =
      if (segmentUnknownSize) idb(0x18, 0x53, 0x80, 0x67) ++ Seq(0xFF.toByte) ++ segBody
      else el(idb(0x18, 0x53, 0x80, 0x67), segBody)
    (ebml ++ seg).toArray
  }

  test("WebM dims + duration are REAL via the EBML element walk") {
    assert(Multimodal.WebmCodec.decode(webmMin()) === Some((1280, 720, 30000L, "webm")))
    // a live-streamed Segment advertises unknown size (all-ones varint)
    assert(Multimodal.WebmCodec.decode(webmMin(segmentUnknownSize = true)) ===
      Some((1280, 720, 30000L, "webm")))
    // MP4 and text fall through; truncation never decodes garbage
    assert(Multimodal.WebmCodec.decode(mp4Min) === None)
    assert(Multimodal.WebmCodec.decode("not an ebml stream".getBytes) === None)
    assert(Multimodal.WebmCodec.decode(webmMin().take(7)) === None)
    // and the default video chain now resolves WebM ahead of the stub
    val viaChain = Multimodal.DefaultVideoCodecs.view
      .flatMap(_.decode(webmMin())).headOption
    assert(viaChain === Some((1280, 720, 30000L, "webm")))
  }

  test("decodeVideoMeta appends a typed struct; text payloads hit the stub tail") {
    val df = Seq(("v1", mp4Min), ("v2", "abcdef".getBytes)).toDF("id", "payload")
    val got = Multimodal.decodeVideoMeta(df, "payload")
    assert(got.columns.toSeq === Seq("id", "payload", "video_meta"))
    val metas = got.orderBy("id")
      .select("video_meta.width", "video_meta.height",
        "video_meta.duration_ms", "video_meta.format")
      .as[(Int, Int, Long, String)].collect()
    assert(metas(0) === ((640, 360, 15000L, "mp4")))
    // stub arithmetic on n=6: 256+6, 144+(6*17)%936, (6%3600)*1000, even→mp4
    assert(metas(1) === ((262, 246, 6000L, "mp4")))
  }

  private def le24(v: Int): Seq[Byte] =
    Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
  private def le32s(v: Int): Seq[Byte] = (0 to 3).map(i => ((v >> (8 * i)) & 0xff).toByte)

  /** RIFF/WEBP with the given chunks ((tag, payload)*), sizes + even
    * padding per the container spec. */
  private def webp(chunks: (String, Seq[Byte])*): Array[Byte] = {
    val body = chunks.flatMap { case (tag, p) =>
      tag.getBytes("US-ASCII").toSeq ++ le32s(p.size) ++ p ++
        (if (p.size % 2 == 1) Seq(0.toByte) else Nil)
    }
    ("RIFF".getBytes("US-ASCII").toSeq ++ le32s(4 + body.size) ++
      "WEBP".getBytes("US-ASCII").toSeq ++ body).toArray
  }

  test("WebP dims are REAL for all three chunk variants") {
    // VP8X: canvas 1024×768 stored as 24-bit LE dims-1 at payload +4/+7
    val vp8x = webp(("VP8X", Seq[Byte](0x02, 0, 0, 0) ++ le24(1023) ++ le24(767)))
    assert(Multimodal.WebPCodec.decode(vp8x) === Some((1024, 768, "webp")))
    // VP8 lossy: 3-byte frame tag, 9D 01 2A sync, then 14-bit LE dims
    val vp8 = webp(("VP8 ", Seq[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a) ++
      le32s(320).take(2) ++ le32s(240).take(2)))
    assert(Multimodal.WebPCodec.decode(vp8) === Some((320, 240, "webp")))
    // VP8L lossless: 0x2F signature then two 14-bit dims-1 packed LE
    val vp8l = webp(("VP8L", Seq(0x2f.toByte) ++ le32s(((200 - 1) << 14) | (100 - 1))))
    assert(Multimodal.WebPCodec.decode(vp8l) === Some((100, 200, "webp")))
    // an odd-sized leading metadata chunk is skipped with even padding
    val metaFirst = webp(("EXIF", Seq[Byte](1, 2, 3)),
      ("VP8X", Seq[Byte](0x02, 0, 0, 0) ++ le24(15) ++ le24(7)))
    assert(Multimodal.WebPCodec.decode(metaFirst) === Some((16, 8, "webp")))
    // bad sync code / non-RIFF / truncation fall through, no bogus dims
    val badSync = webp(("VP8 ", Seq[Byte](0, 0, 0, 0x11, 0x01, 0x2a, 0, 0, 0, 0)))
    assert(Multimodal.WebPCodec.decode(badSync) === None)
    assert(Multimodal.WebPCodec.decode("RIFFxxxxWAVE".getBytes ++ Array.fill[Byte](20)(0)) === None)
    assert(Multimodal.WebPCodec.decode(vp8x.take(14)) === None)
  }

  /** Minimal AVIF: ftyp(avif), meta(FullBox){iprp{ipco{ispe}}}. */
  private def avifMin(w: Int, h: Int, brand: String = "avif"): Array[Byte] = {
    def be32(v: Int): Seq[Byte] = (3 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte)
    def box(tpe: String, payload: Seq[Byte]): Seq[Byte] =
      be32(8 + payload.size) ++ tpe.getBytes("US-ASCII") ++ payload
    val ispe = box("ispe", Seq[Byte](0, 0, 0, 0) ++ be32(w) ++ be32(h))
    val meta = box("meta", Seq[Byte](0, 0, 0, 0) ++ box("iprp", box("ipco", ispe)))
    (box("ftyp", brand.getBytes("US-ASCII").toSeq ++ be32(0) ++
      "mif1".getBytes("US-ASCII").toSeq) ++ meta).toArray
  }

  test("AVIF dims are REAL via the shared ISO-BMFF walk to ispe") {
    assert(Multimodal.AvifCodec.decode(avifMin(800, 600)) === Some((800, 600, "avif")))
    // brand in the compatible list instead of major
    val compat = {
      // rewrite major brand to mif1 and compatible to avif
      val out = avifMin(32, 16).clone()
      "mif1".getBytes("US-ASCII").copyToArray(out, 8)
      "avif".getBytes("US-ASCII").copyToArray(out, 16)
      out
    }
    assert(Multimodal.AvifCodec.decode(compat) === Some((32, 16, "avif")))
    // a plain MP4 ftyp (isom) is NOT claimed by the AVIF codec
    assert(Multimodal.AvifCodec.decode(mp4Min) === None)
    // truncated meta falls through
    assert(Multimodal.AvifCodec.decode(avifMin(800, 600).take(24)) === None)
  }

  /** Minimal TIFF: byte-order mark, magic 42, one IFD with SHORT
    * ImageWidth (256) and LONG ImageLength (257) entries. */
  private def tiffMin(w: Int, h: Int, little: Boolean): Array[Byte] = {
    def u16(v: Int): Seq[Byte] =
      if (little) Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      else Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32(v: Int): Seq[Byte] =
      if (little) (0 to 3).map(i => ((v >> (8 * i)) & 0xff).toByte)
      else (3 to 0 by -1).map(i => ((v >> (8 * i)) & 0xff).toByte)
    val bom = if (little) Seq('I'.toByte, 'I'.toByte) else Seq('M'.toByte, 'M'.toByte)
    // width as SHORT (value in the field head + 2 pad bytes), height as LONG
    val entries = (u16(256) ++ u16(3) ++ u32(1) ++ u16(w) ++ u16(0)) ++
      (u16(257) ++ u16(4) ++ u32(1) ++ u32(h))
    (bom ++ u16(42) ++ u32(8) ++ u16(2) ++ entries ++ u32(0)).toArray
  }

  test("TIFF dims are REAL in both byte orders") {
    assert(Multimodal.TiffCodec.decode(tiffMin(640, 480, little = true)) ===
      Some((640, 480, "tiff")))
    assert(Multimodal.TiffCodec.decode(tiffMin(31, 7, little = false)) ===
      Some((31, 7, "tiff")))
    // bad magic / truncation fall through
    assert(Multimodal.TiffCodec.decode("IIxxnope".getBytes) === None)
    assert(Multimodal.TiffCodec.decode(tiffMin(640, 480, little = true).take(9)) === None)
    // hostile IFD offset near Int.MaxValue must fall through, not throw
    val hostile = tiffMin(1, 1, little = false).clone()
    hostile(4) = 0x7f.toByte; hostile(5) = 0xff.toByte
    hostile(6) = 0xff.toByte; hostile(7) = 0xfe.toByte
    assert(Multimodal.TiffCodec.decode(hostile) === None)
  }

  /** Minimal FLAC: fLaC magic + STREAMINFO (44.1kHz stereo 16-bit,
    * 441000 samples = 10 s). */
  private def flacMin: Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]('f', 'L', 'a', 'C')
    out ++= Seq(0x80.toByte, 0, 0, 34) // last-block flag + type 0, len 34
    val si = Array.fill[Byte](34)(0)
    // rate 44100 (20 bits), channels-1=1 (3), bps-1=15 (5), samples 441000 (36)
    si(10) = ((44100 >> 12) & 0xff).toByte
    si(11) = ((44100 >> 4) & 0xff).toByte
    si(12) = ((((44100 & 0xf) << 4) | (1 << 1) | (15 >> 4)) & 0xff).toByte
    si(13) = ((((15 & 0xf) << 4) | ((441000L >> 32) & 0xf)).toInt & 0xff).toByte
    si(14) = ((441000L >> 24) & 0xff).toByte
    si(15) = ((441000L >> 16) & 0xff).toByte
    si(16) = ((441000L >> 8) & 0xff).toByte
    si(17) = (441000L & 0xff).toByte
    (out ++= si).toArray
  }

  test("FLAC STREAMINFO decodes rate/channels/bits/duration") {
    assert(Multimodal.FlacCodec.decode(flacMin) === Some((2, 44100, 16, 10000L, "flac")))
    // first block not STREAMINFO → not a valid FLAC, fall through
    val notSi = flacMin.clone(); notSi(4) = 0x84.toByte
    assert(Multimodal.FlacCodec.decode(notSi) === None)
    assert(Multimodal.FlacCodec.decode(flacMin.take(20)) === None)
  }

  /** MP3: ID3v2 tag (10-byte header, 100-byte body) + one MPEG-1
    * Layer III frame header (128 kbps, 44.1 kHz, joint stereo) and
    * 16 kB of frame payload → CBR estimate (16494-110)*8/128 ms. */
  private def mp3Min: Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= "ID3".getBytes("US-ASCII")
    out ++= Seq[Byte](4, 0, 0) // version+flags
    out ++= Seq[Byte](0, 0, 0, 100) // syncsafe size 100
    out ++= Array.fill[Byte](100)(0)
    // FF FB: sync + MPEG-1 Layer III no-CRC; 90: bitrate idx 9 (128k),
    // rate idx 0 (44100); 40: joint stereo
    out ++= Seq(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x40.toByte)
    out ++= Array.fill[Byte](16380)(0x55)
    out.toArray
  }

  test("MP3 frame header decodes rate/channels and the CBR duration estimate") {
    val n = mp3Min.length - 110 // audio bytes after the ID3 tag
    assert(Multimodal.Mp3Codec.decode(mp3Min) ===
      Some((2, 44100, 0, n.toLong * 8 / 128, "mp3")))
    // mono MPEG-2 frame, no ID3: FF E2 → version 2? (bits 10), layer III
    val v2 = Array(0xff.toByte, 0xf3.toByte, 0x92.toByte, 0xc0.toByte) ++
      Array.fill[Byte](5000)(0x11)
    // f3 = sync+version 2(10)+layer III(01)+nocrc; 92: idx 9 (V2 → 80k), rate idx 0 → 22050; c0: mono
    assert(Multimodal.Mp3Codec.decode(v2) ===
      Some((1, 22050, 0, 5004L * 8 / 80, "mp3")))
    // free-format bitrate (0) and garbage fall through
    val free = Array(0xff.toByte, 0xfb.toByte, 0x00.toByte, 0x40.toByte) ++ Array.fill[Byte](100)(0)
    assert(Multimodal.Mp3Codec.decode(free) === None)
    assert(Multimodal.Mp3Codec.decode("definitely not audio".getBytes) === None)
  }

  test("decodeImageMeta chain resolves WebP/AVIF ahead of the stub") {
    val df = Seq(
      ("a", webp(("VP8X", Seq[Byte](0x02, 0, 0, 0) ++ le24(99) ++ le24(49)))),
      ("b", avifMin(12, 34)),
      ("c", "just text".getBytes)).toDF("id", "payload")
    val got = Multimodal.decodeImageMeta(df, "payload").orderBy("id")
      .select("meta.width", "meta.height", "meta.format")
      .as[(Int, Int, String)].collect()
    assert(got(0) === ((100, 50, "webp")))
    assert(got(1) === ((12, 34, "avif")))
    // n=9 odd → stub jpeg
    assert(got(2)._3 === "jpeg")
  }

  /** 8×8 gray gradient PNG whose dHash is hand-computable. */
  private def gradientPng(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val g = f(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    bos.toByteArray
  }

  test("perceptualHash: monotone gradient sets every bit, flat image none") {
    val df = Seq(
      ("up", gradientPng((x, _) => x * 30)),      // strictly increasing in x
      ("flat", gradientPng((_, _) => 128)),       // no gradient at all
      ("down", gradientPng((x, _) => 255 - x * 30)), // strictly decreasing
      ("txt", "not an image".getBytes)).toDF("id", "payload")
    val got = Multimodal.perceptualHash(df, "payload")
      .select("id", "phash").as[(String, Option[Long])].collect().toMap
    assert(got("up") === Some((1L << 56) - 1)) // all 56 bits
    assert(got("flat") === Some(0L))
    assert(got("down") === Some(0L)) // strictly decreasing: no x+1 > x
    assert(got("txt") === None) // unreadable payload → NULL, not garbage
  }

  test("perceptualHash is invariant to uniform brightness shift") {
    def pattern(shift: Int)(x: Int, y: Int) = ((x * 7 + y * 3) % 11) * 20 + shift
    val df = Seq(
      ("base", gradientPng(pattern(0))),
      ("brighter", gradientPng(pattern(35)))).toDF("id", "payload")
    val got = Multimodal.perceptualHash(df, "payload")
      .select("id", "phash").as[(String, Long)].collect().toMap
    assert(got("base") === got("brighter"))
  }

  test("perceptualHash survives lossless re-encoding (png vs bmp same pixels)") {
    def mk(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) {
        val g = ((x * 13 + y * 5) % 17) * 15
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val got = Multimodal.perceptualHash(
      Seq(("png", mk("png")), ("bmp", mk("bmp"))).toDF("id", "payload"),
      "payload")
      .select("id", "phash").as[(String, Long)].collect().toMap
    assert(got("png") === got("bmp"))
  }
}
