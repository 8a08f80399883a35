package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (build brief: image/audio/video as opaque
  * binary columns with typed metadata).
  *
  * The container has no image/audio codecs, so `decodeImageMeta`'s
  * pixel-decode step is a STUB — a deterministic fake derived from the
  * raw bytes — but everything Spark-side is real and load-bearing:
  * the (payload BINARY, meta STRUCT) schema, the mapPartitions batch
  * shape (one decoder instance per partition, streaming iterator — the
  * exact shape a JNI/FFmpeg decoder needs), and the row-preserving
  * contract. Swap `fakeDecode` for a real codec and nothing else moves.
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** STUB decode: deterministic pseudo-metadata from the payload bytes.
    * Real implementation would parse the container header. */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, String) = {
    val n = if (bytes == null) 0 else bytes.length
    (64 + n % 512, 64 + (n * 31) % 512, if (n % 2 == 0) "png" else "jpeg")
  }

  /** Attach decoded metadata to a binary payload column.
    *
    * mapPartitions, not a per-row UDF: a real decoder amortizes codec
    * init per partition and can release native resources when the
    * iterator drains. The iterator is lazy — no partition-sized
    * materialization.
    */
  def decodeImageMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", MetaSchema))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      // per-partition decoder init would go here (real codec: open once)
      rows.map { row =>
        val (w, h, f) = fakeDecode(row.getAs[Array[Byte]](idx))
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
