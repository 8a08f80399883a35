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

  val all: Seq[Q] = Seq(q35BinaryMeta, q36DecodeMeta)
}
