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
