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
    // hand-assemble a minimal BMP header: 'BM', int32-LE width=640 at
    // offset 18, height=-480 at offset 22 (negative = top-down; decoded
    // dimension is the magnitude)
    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'
    def putLe(o: Int, v: Int): Unit = (0 until 4).foreach(i => bmp(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    putLe(18, 640); putLe(22, -480)
    val df = Seq(("bmp1", bmp)).toDF("id", "payload")
    val meta = Multimodal.decodeImageMeta(df, "payload")
      .select("meta.width", "meta.height", "meta.format")
      .as[(Int, Int, String)].head()
    assert(meta === ((640, 480, "bmp")))
    // direct codec unit check too (no Spark in the loop)
    assert(Multimodal.BmpCodec.decode(bmp) === Some((640, 480, "bmp")))
    assert(Multimodal.BmpCodec.decode("not a bmp".getBytes) === None)
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

  test("sampleFrames fans out one row per sampled frame") {
    val got = Multimodal.sampleFrames(payloads, "payload", everyNth = 2)
    // n_frames = len%240+1 → abcd:5, abcdef:7 → frames sampled: ceil(5/2)=3, ceil(7/2)=4
    assert(got.count() === 3 + 4)
    assert(got.columns.contains("frame_offset"))
  }
}
