package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (build brief: image/audio/video as opaque
  * binary columns with typed metadata).
  *
  * Decoding goes through the sealed [[ImageCodec]] seam: formats whose
  * headers are parseable in pure JVM code (BMP, PNG) are REALLY parsed;
  * everything else falls through to [[StubCodec]], a deterministic fake
  * derived from the raw bytes (the container ships no pixel codecs).
  * Everything Spark-side is real and load-bearing either way: the
  * (payload BINARY, meta STRUCT) schema, the mapPartitions batch shape
  * (one decoder chain per partition, streaming iterator — the exact
  * shape a JNI/FFmpeg decoder needs), and the row-preserving contract.
  * Dropping in a real pixel codec = adding one [[ImageCodec]] instance;
  * nothing else moves.
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** One image format's header parser. Implementations must be cheap to
    * construct and thread-safe (one chain is instantiated per
    * partition); `decode` returns None when the payload is not in this
    * codec's format so the chain can fall through. */
  sealed trait ImageCodec extends Serializable {
    def decode(bytes: Array[Byte]): Option[(Int, Int, String)]
  }

  /** REAL decode path: BMP (BITMAPINFOHEADER) — 'BM' magic, int32-LE
    * width at offset 18, height at 22 (negative height = top-down rows,
    * dimension is the magnitude). Pure JVM, no codec library. */
  case object BmpCodec extends ImageCodec {
    def decode(b: Array[Byte]): Option[(Int, Int, String)] = {
      if (b == null || b.length < 26 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) None
      else {
        def le32(o: Int): Int =
          (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
            ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
        Some((le32(18), math.abs(le32(22)), "bmp"))
      }
    }
  }

  /** REAL decode path: PNG — 8-byte signature, IHDR width/height as
    * int32-BE at offsets 16/20. Pure JVM, no codec library. */
  case object PngCodec extends ImageCodec {
    private val Sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def decode(b: Array[Byte]): Option[(Int, Int, String)] = {
      if (b == null || b.length < 24 || !Sig.indices.forall(i => b(i) == Sig(i))) None
      else {
        def be32(o: Int): Int =
          ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
            ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
        Some((be32(16), be32(20), "png"))
      }
    }
  }

  /** STUB tail of the chain: deterministic pseudo-metadata from the
    * payload bytes, for formats the container cannot decode. Always
    * matches, so a codec chain ending here never drops a row. */
  case object StubCodec extends ImageCodec {
    def decode(bytes: Array[Byte]): Option[(Int, Int, String)] = {
      val n = if (bytes == null) 0 else bytes.length
      Some((64 + n % 512, 64 + (n * 31) % 512, if (n % 2 == 0) "png" else "jpeg"))
    }
  }

  /** The default chain: real header parsers first, stub fallback last. */
  val DefaultCodecs: Seq[ImageCodec] = Seq(BmpCodec, PngCodec, StubCodec)

  /** Attach decoded metadata to a binary payload column.
    *
    * mapPartitions, not a per-row UDF: a real decoder amortizes codec
    * init per partition and can release native resources when the
    * iterator drains. The iterator is lazy — no partition-sized
    * materialization.
    */
  def decodeImageMeta(df: DataFrame, payloadCol: String,
      codecs: Seq[ImageCodec] = DefaultCodecs): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", MetaSchema))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition decoder init goes here (real codec: open once)
      val chain = codecs
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val (w, h, f) = chain.view.flatMap(_.decode(bytes)).headOption
          .getOrElse((0, 0, "unknown"))
        Row.fromSeq(row.toSeq :+ Row(w, h, f))
      }
    }(enc)
  }

  /** Frame-sampling shape for video-like payloads: 1 row in → k
    * frame-descriptor rows out, without loading all frames at once. */
  def sampleFrames(df: DataFrame, payloadCol: String, everyNth: Int): DataFrame =
    df.withColumn("n_frames",
        (length(col(payloadCol)) % 240 + 1).cast("int")) // STUB frame count
      .withColumn("frame_idx",
        explode(sequence(lit(0), floor((col("n_frames") - 1) / everyNth).cast("int"))))
      .withColumn("frame_offset", col("frame_idx") * everyNth)
      .drop("frame_idx")

  /** Resize shape: payload → transformed payload + target-dimension
    * meta. STUB transform (truncate to half length — deterministic on
    * the input bytes); the real version swaps in a codec inside the
    * same mapPartitions body. Output schema: input columns with the
    * payload replaced and a `resized_meta` struct appended. */
  def resizeImage(df: DataFrame, payloadCol: String, w: Int, h: Int): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val schema = StructType(df.schema.fields :+ StructField("resized_meta", MetaSchema))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](idx)
        val out = if (bytes == null) null else bytes.take(math.max(1, bytes.length / 2))
        Row.fromSeq(row.toSeq.updated(idx, out) :+ Row(w, h, "png"))
      }
    }(enc)
  }
}
