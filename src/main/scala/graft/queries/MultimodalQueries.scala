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

  val all: Seq[Q] = Seq(q35BinaryMeta, q36DecodeMeta, q115AudioMeta, q116VideoMeta)
}
