package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling (training-data pipelines need
  * STABLE splits: re-running the pipeline, or running it on a different
  * engine, must select the same rows — `TABLESAMPLE`/`df.sample` are
  * seed+partition dependent and reproduce on neither count).
  *
  * The selector hashes the row's key with md5 (identical everywhere) and
  * keeps rows whose hash bucket falls below the requested percentage. A
  * derived split column ("train"/"test"/...) is the same idea with range
  * boundaries.
  */
object Sampling {

  /** 0..99 bucket from the first 60 bits of md5 of the key's string form. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % 100

  /** Keep ~pct% of rows, deterministically by key. */
  def hashSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.filter(hashBucket(key) < pct)

  /** Deterministic uniform in [0, 1) from the first 60 bits of md5 of
    * the key's string form — the portable stand-in for rand() that both
    * engines compute identically (long→double rounding is IEEE
    * round-to-nearest in both JVMs and DuckDB). */
  def hashUniform(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("double") /
      lit((1L << 60).toDouble)

  /** Efraimidis–Spirakis weighted-reservoir sort key: ranking rows by
    * ln(u)/w DESCENDING draws a weighted sample without replacement —
    * P(selected) proportional to weight — yet is fully deterministic
    * given the keys (same rows selected on any engine, any partitioning,
    * any run). Top-k per group = one window; no state, no RNG. */
  def weightedSampleKey(key: Column, weight: Column): Column =
    log(hashUniform(key)) / weight

  /** Assign each row a stable split label by key: boundaries are
    * cumulative percentages, e.g. Seq(("train", 80), ("test", 100)). */
  def splitColumn(key: Column, boundaries: Seq[(String, Int)]): Column = {
    val b = hashBucket(key)
    boundaries.sortBy(_._2).foldRight(lit(null).cast("string")) {
      case ((name, hi), rest) => when(b < hi, name).otherwise(rest)
    }
  }

  /** Deterministic training-shard assignment — the "write the corpus as
    * N shards in shuffled order" step every pretraining run starts from.
    * shard = 60-bit md5(key) mod nShards; pos = row_number within the
    * shard ordered by (hash, key). Reading shards sequentially by pos
    * IS the epoch-shuffled order (hash order decorrelates ingest/crawl
    * locality) — yet there is NO total-order sort: each shard orders
    * independently, so at 100 TB nShards tracks cluster parallelism and
    * no single barrier ever sees the whole corpus. Fully deterministic
    * on any engine / partitioning / rerun — same contract as
    * [[hashBucket]], extended with a position. Appends `shard` (int)
    * and `pos` (long, 1-based dense within shard). */
  def assignShards(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val byShard = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__gshard")).orderBy(col("__ghash"), key)
    df.withColumn("__ghash",
        conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"))
      .withColumn("__gshard", (col("__ghash") % nShards).cast("int"))
      .withColumn("pos", row_number().over(byShard).cast("long"))
      .withColumn("shard", col("__gshard"))
      .drop("__ghash", "__gshard")
  }

  /** Rendezvous (highest-random-weight) shard assignment — the
    * RESHARD-friendly alternative to [[assignShards]]'s `hash mod N`:
    * each key goes to the shard with the highest md5(key#shard) score,
    * so growing N → N+1 moves ONLY the keys won by the new shard
    * (≈ 1/(N+1) of them) instead of rehashing (N-1)/N of the corpus —
    * what a 100 TB store needs when the shard count must grow in
    * place. In-row argmax over N deterministic hashes (O(N) md5s per
    * row — the right trade for shard counts in the tens-to-hundreds;
    * at thousands prefer mod-sharding or a jump-hash). Ties break to
    * the lowest shard id (array_position returns the FIRST max), and
    * the identical (score DESC, shard ASC) rule is expressible
    * relationally for the oracle. Deterministic on any engine /
    * partitioning / rerun, like every hash in this file. */
  def rendezvousShard(key: Column, nShards: Int): Column = {
    require(nShards > 0, "nShards must be positive")
    val scores = transform(sequence(lit(0), lit(nShards - 1)), s =>
      conv(substring(md5(concat(key.cast("string"), lit("#"), s.cast("string"))),
        1, 15), 16, 10).cast("long"))
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }
}
