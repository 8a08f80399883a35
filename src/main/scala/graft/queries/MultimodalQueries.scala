package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal-column queries: `documents.text` bytes stand in for an
  * opaque media payload (the container ships no codecs — see
  * `Multimodal` scaladoc for what's stubbed vs real).
  */
object MultimodalQueries {

  /** Binary-payload metadata: byte length is real arithmetic on the
    * binary column in both dialects (UTF-8 bytes ↔ BLOB), so this part
    * of the multimodal plumbing IS oracle-checked. */
  val q35BinaryMeta = Q(
    "q35_binary_meta",
    """SELECT source,
      |  CAST(count(*) AS BIGINT) AS n_payloads,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  CAST(max(octet_length(encode(text))) AS INT) AS max_bytes
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_payloads"),
        sum(length(col("payload"))).as("total_bytes"),
        max(length(col("payload"))).cast("int").as("max_bytes"))
      .orderBy(col("source"))
  }

  /** The mapPartitions decode path (stubbed codec, real plumbing):
    * meta struct is derived deterministically from payload bytes, so the
    * oracle can reproduce the fake decode arithmetic in SQL. */
  val q36DecodeMeta = Q(
    "q36_decode_meta",
    """SELECT format, CAST(count(*) AS BIGINT) AS n,
      |  round(avg(width), 4) AS avg_width
      |FROM (
      |  SELECT 64 + octet_length(encode(text)) % 512 AS width,
      |    CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
      |  FROM documents) t
      |GROUP BY format
      |ORDER BY format""".stripMargin) { (spark, dir) =>
    val withPayload = Tables.documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
    Multimodal.decodeImageMeta(withPayload, "payload")
      .groupBy(col("meta.format").as("format"))
      .agg(count(lit(1)).as("n"), round(avg(col("meta.width")), 4).as("avg_width"))
      .orderBy(col("format"))
  }

  /** Audio-modality decode path (real WAV chunk walk in the chain;
    * text payloads land on the stub tail whose arithmetic the oracle
    * replays — same contract as q36). */
  val q115AudioMeta = Q(
    "q115_audio_meta",
    """SELECT format, CAST(count(*) AS BIGINT) AS n,
      |  round(avg(sample_rate), 4) AS avg_rate,
      |  CAST(sum(duration_ms) AS BIGINT) AS total_ms
      |FROM (
      |  SELECT 8000 + (octet_length(encode(text)) % 5) * 8000 AS sample_rate,
      |    (octet_length(encode(text)) % 600) * 1000 AS duration_ms,
      |    CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'mp3' ELSE 'aac' END AS format
      |  FROM documents) t
      |GROUP BY format
      |ORDER BY format""".stripMargin) { (spark, dir) =>
    val withPayload = Tables.documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
    Multimodal.decodeAudioMeta(withPayload, "payload")
      .groupBy(col("audio_meta.format").as("format"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("audio_meta.sample_rate")), 4).as("avg_rate"),
        sum(col("audio_meta.duration_ms")).as("total_ms"))
      .orderBy(col("format"))
  }

  /** Video-modality decode path (real MP4 box walk in the chain; text
    * payloads land on the stub tail, oracle replays its arithmetic). */
  val q116VideoMeta = Q(
    "q116_video_meta",
    """SELECT format, CAST(count(*) AS BIGINT) AS n,
      |  round(avg(width), 4) AS avg_width,
      |  CAST(max(duration_ms) AS BIGINT) AS max_ms
      |FROM (
      |  SELECT 256 + octet_length(encode(text)) % 1024 AS width,
      |    (octet_length(encode(text)) % 3600) * 1000 AS duration_ms,
      |    CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'mp4' ELSE 'webm' END AS format
      |  FROM documents) t
      |GROUP BY format
      |ORDER BY format""".stripMargin) { (spark, dir) =>
    val withPayload = Tables.documents(spark, dir)
      .withColumn("payload", col("text").cast("binary"))
    Multimodal.decodeVideoMeta(withPayload, "payload")
      .groupBy(col("video_meta.format").as("format"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("video_meta.width")), 4).as("avg_width"),
        max(col("video_meta.duration_ms")).as("max_ms"))
      .orderBy(col("format"))
  }

  /** Perceptual image dedup (`Multimodal.perceptualHash`) — dHash over
    * the REAL pixel path, through the driver gate: each document gets a
    * deterministic 8×8 gray PNG (pixel value a pure integer formula of
    * doc_id), Spark round-trips it through genuine `ImageIO` encode →
    * decode → nearest-neighbor resample → integer-grayscale dHash,
    * and the DuckDB twin computes the same 56-bit hashes straight from
    * the pixel formula — so a hash match proves the whole real codec
    * path reproduces the formula pixels bit-exactly, not just in specs.
    * The census groups images by hash: same pattern ⇒ same hash makes
    * image dedup the familiar hash-groupBy shuffle (and the SimHash
    * banding machinery applies unchanged for near-matches at Hamming
    * distance). The PNG-synthesis UDF is fixture scaffolding — the
    * operator under test is the decode path, whose cost dominates. */
  val q165ImagePhashDedup = Q(
    "q165_image_phash_dedup",
    """WITH pats AS (SELECT DISTINCT doc_id % 25 AS p FROM documents),
      |grid AS (
      |  SELECT p, x.x AS x, y.y AS y
      |  FROM pats, unnest(range(0, 7)) AS x(x), unnest(range(0, 8)) AS y(y)),
      |bits AS (
      |  SELECT p, x, y,
      |    CASE WHEN
      |      (((p % 5 + 1) * (x + 2) * (y + 2)
      |        + (p // 5 + 1) * (x + 1) * (x + 1) + p) % 17) * 15
      |      >
      |      (((p % 5 + 1) * (x + 1) * (y + 2)
      |        + (p // 5 + 1) * x * x + p) % 17) * 15
      |    THEN 1 ELSE 0 END AS bit
      |  FROM grid),
      |hashes AS (
      |  SELECT p, CAST(sum(CAST(bit AS BIGINT) << (y * 7 + x)) AS BIGINT) AS phash
      |  FROM bits GROUP BY p)
      |SELECT h.phash, CAST(count(*) AS BIGINT) AS n_images,
      |  CAST(count(DISTINCT d.doc_id % 25) AS BIGINT) AS n_patterns
      |FROM documents d JOIN hashes h ON h.p = d.doc_id % 25
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val mkPng = udf { (docId: Long) =>
      val p = (docId % 25).toInt
      val a = p % 5 + 1
      val b = p / 5 + 1
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val g = ((a * (x + 1) * (y + 2) + b * x * x + p) % 17) * 15
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val withImg = Tables.documents(spark, dir)
      .select(col("doc_id"), mkPng(col("doc_id")).as("payload"))
    Multimodal.perceptualHash(withImg, "payload")
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_images"),
        countDistinct(col("doc_id") % 25).as("n_patterns"))
      .orderBy(col("phash"))
  }

  val all: Seq[Q] = Seq(q35BinaryMeta, q36DecodeMeta, q115AudioMeta,
    q116VideoMeta, q165ImagePhashDedup)
}
