package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** The q124 CDC upsert, applied INCREMENTALLY as a change stream: the
  * versioned foreachBatch MERGE must converge to the one-shot batch
  * MERGE, and replaying a micro-batch must be a fixpoint (the
  * exactly-once-by-idempotence claim in StreamOps.upsertBatches). */
class MaintenanceStreamSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // q124's exact change feed, in the snapshot schema (k, nk, ab, seg)
  private def baseAndChanges = {
    val base = Tables.customer(spark, sfDir).select(
      col("c_custkey").as("k"), col("c_nationkey").as("nk"),
      col("c_acctbal").as("ab"), col("c_mktsegment").as("seg"))
    val updates = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 2 === 1)
      .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
        (col("c_acctbal") + 100).as("ab"), lit("MOVED").as("seg"))
    val inserts = Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 10 === 0)
      .select((col("c_custkey") + 1000000).as("k"), col("c_nationkey").as("nk"),
        lit(0.0).as("ab"), lit("NEW").as("seg"))
    (base, updates.unionByName(inserts))
  }

  test("streamed CDC upsert converges to the batch MERGE (q124 parity)") {
    val (base, changes) = baseAndChanges
    val feedDir = java.nio.file.Files.createTempDirectory("cdc-feed").toString
    val snapDir = java.nio.file.Files.createTempDirectory("cdc-snap").toString
    val ckDir = java.nio.file.Files.createTempDirectory("cdc-ck").toString
    // three single-file appends → three micro-batches (file source runs
    // maxFilesPerTrigger=1). Chunks partition the key space, so batch
    // ARRIVAL order cannot matter — only the merge semantics can.
    for (i <- 0 until 3)
      changes.filter(col("k") % 3 === i)
        .coalesce(1).write.mode("append").parquet(feedDir)

    StreamOps.bootstrapSnapshot(base, snapDir)
    val schema = spark.read.parquet(feedDir).schema
    StreamOps.upsertBatches(
      StreamOps.parquetStream(spark, schema, feedDir), "k", snapDir, ckDir)

    val snap = StreamOps.latestSnapshot(spark, snapDir)
      .getOrElse(fail("no snapshot written"))
    // the registered q124 audit rollup is the batch truth; the snapshot
    // has no base-vs-change lineage, so compare the lineage-free columns
    val expect = graft.queries.RelationalQueries.q124UpsertMerge
      .run(spark, sfDir)
      .select(col("nationkey"), col("n_rows"), col("total_acctbal"))
      .orderBy(col("nationkey")).collect()
    val got = snap.groupBy(col("nk").as("nationkey"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("ab")), 2).as("total_acctbal"))
      .orderBy(col("nationkey")).collect()
    assert(got.map(_.toString).toSeq === expect.map(_.toString).toSeq)
  }

  test("re-applying a chunk to the final snapshot is a fixpoint (replay-safe)") {
    val (base, changes) = baseAndChanges
    val snapDir = java.nio.file.Files.createTempDirectory("cdc-snap2").toString
    val ckDir = java.nio.file.Files.createTempDirectory("cdc-ck2").toString
    val feedDir = java.nio.file.Files.createTempDirectory("cdc-feed2").toString
    changes.coalesce(1).write.mode("append").parquet(feedDir)
    StreamOps.bootstrapSnapshot(base, snapDir)
    val schema = spark.read.parquet(feedDir).schema
    StreamOps.upsertBatches(
      StreamOps.parquetStream(spark, schema, feedDir), "k", snapDir, ckDir)
    val snap = StreamOps.latestSnapshot(spark, snapDir)
      .getOrElse(fail("no snapshot written"))
    // simulate the crash-replay: merge the SAME change set once more
    val replayed = snap.as("s").join(changes.dropDuplicates(Seq("k")).as("c"),
        col("s.k") === col("c.k"), "full_outer")
      .select(snap.columns.toSeq.map(c =>
        coalesce(col(s"c.$c"), col(s"s.$c")).as(c)): _*)
    assert(replayed.exceptAll(snap).isEmpty && snap.exceptAll(replayed).isEmpty,
      "replaying the change set changed the snapshot")
  }

  test("GC keeps the replay merge base: crash-before-commit + GC + restart loses nothing") {
    // the data-loss window gcSnapshots must respect: a version's
    // _SUCCESS proves the PARQUET write committed, not the streaming
    // batch — if the crash lands between the two, the restart replays
    // that batch and its merge reads the newest complete version BELOW
    // it. GC with keepLast=1 must keep that base alive.
    val (base, changes) = baseAndChanges
    val feedDir = java.nio.file.Files.createTempDirectory("cdc-feed3").toString
    val snapDir = java.nio.file.Files.createTempDirectory("cdc-snap3").toString
    val ckDir = java.nio.file.Files.createTempDirectory("cdc-ck3").toString
    for (i <- 0 until 2)
      changes.filter(col("k") % 2 === i)
        .coalesce(1).write.mode("append").parquet(feedDir)
    StreamOps.bootstrapSnapshot(base, snapDir)
    val schema = spark.read.parquet(feedDir).schema
    def run(ck: String): Unit = StreamOps.upsertBatches(
      StreamOps.parquetStream(spark, schema, feedDir), "k", snapDir, ck)
    run(ckDir) // batches 0, 1 → versions v-1 (bootstrap), v0, v1
    def versions = new java.io.File(snapDir).listFiles()
      .map(_.getName).filter(_.matches("v-?\\d+")).sortBy(_.drop(1).toLong).toSeq
    assert(versions === Seq("v-1", "v0", "v1"), versions)
    val healthy = StreamOps.latestSnapshot(spark, snapDir).get
      .orderBy("k").collect().map(_.toString).toSeq
    // simulate the crash window: batch 1's parquet committed (v1 has
    // _SUCCESS) but its checkpoint commit never landed. The crashed
    // checkpoint is reconstructed at a FRESH path (same JVM caches the
    // original's metadata log and would flag external edits as
    // concurrent use — a restart after a real crash is a new JVM).
    val ckDir2 = java.nio.file.Files.createTempDirectory("cdc-ck3b").toString
    import java.nio.file.{Files, Paths}
    val src = Paths.get(ckDir)
    val walk = Files.walk(src)
    try walk.forEach { p =>
      val dst = Paths.get(ckDir2).resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(dst)
      else Files.copy(p, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally walk.close()
    assert(new java.io.File(s"$ckDir2/commits/1").delete(),
      "test rig expected a commit log entry to remove")
    new java.io.File(s"$ckDir2/commits/.1.crc").delete() // checksum twin
    // GC with the tightest retention: v1 (newest complete) stays, and
    // v0 MUST stay too (the replay base below the newest started
    // version); only the bootstrap v-1 is history
    assert(StreamOps.gcSnapshots(spark, snapDir, keepLast = 1) === Seq("v-1"),
      "GC reclaimed the replay merge base")
    assert(versions === Seq("v0", "v1"), versions)
    // restart: batch 1 replays (offsets logged, commit missing), merges
    // against v0, rewrites v1 — the state must equal the healthy run
    run(ckDir2)
    val replayed = StreamOps.latestSnapshot(spark, snapDir).get
      .orderBy("k").collect().map(_.toString).toSeq
    assert(replayed === healthy,
      "replay after GC diverged from the no-crash state")
  }

  test("GC-vs-serving race: a read at EVERY deletion point lands on a complete version") {
    // gcSnapshots' ordering argument (delete _SUCCESS first, then the
    // directory) was reasoned but untested (r12 verdict #5). This drill
    // replays the EXACT published deletion sequence step-wise — marker
    // gone, directory half-deleted, directory gone — and interleaves a
    // serving read at every point, including the adversarial
    // beforeId-bounded reader whose preferred version is the one being
    // deleted. The reader must always land on a COMPLETE version's
    // exact rows, or fail loudly (all-torn) — never serve a
    // half-deleted directory. A twin directory then runs the real
    // gcSnapshots to pin that the replayed sequence IS the
    // implementation's (same deletion set + order, same survivors).
    import java.nio.file.{Files, Paths}
    def buildVersions(dir: String): Unit =
      for (v <- -1 to 3)
        spark.range(10).select((col("id") + lit(100L * (v + 2))).as("k"))
          .coalesce(1).write.parquet(s"$dir/v$v")
    val manual = Files.createTempDirectory("gc-race-man").toString
    val twin = Files.createTempDirectory("gc-race-twin").toString
    buildVersions(manual); buildVersions(twin)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("k").collect().map(_.getLong(0)).toSeq
    val vRows = (-1 to 3).map(v =>
      v -> rows(spark.read.parquet(s"$manual/v$v"))).toMap
    // keepLast=2 over complete v-1..v3 (maxStarted v3, replay base v2):
    // deletes v-1, v0, v1, oldest first, marker-then-directory each
    val toDelete = Seq(-1L, 0L, 1L)
    def assertServingInvariant(deletedSoFar: Set[Long], midDelete: Set[Long]): Unit = {
      // unbounded reader: always the newest complete version, exact rows
      assert(rows(StreamOps.latestSnapshot(spark, manual).get) === vRows(3),
        s"unbounded read diverged (deleted=$deletedSoFar mid=$midDelete)")
      // adversarial bounded readers: one per version boundary
      for (b <- -1L to 3L) {
        val aliveBelow = (-1L to 3L).filter(v =>
          v < b && !deletedSoFar.contains(v) && !midDelete.contains(v))
        if (aliveBelow.nonEmpty)
          assert(rows(StreamOps.latestSnapshot(spark, manual, beforeId = b).get)
              === vRows(aliveBelow.max.toInt),
            s"bounded read beforeId=$b (deleted=$deletedSoFar mid=$midDelete)")
        else {
          // every candidate below b is deleted or torn: either nothing
          // is listed (None) or the all-torn loud failure — NEVER data
          val torn = (-1L until b).exists(midDelete.contains)
          if (torn)
            intercept[IllegalStateException](
              StreamOps.latestSnapshot(spark, manual, beforeId = b))
          else
            assert(StreamOps.latestSnapshot(spark, manual, beforeId = b).isEmpty)
        }
      }
    }
    var deleted = Set.empty[Long]
    assertServingInvariant(deleted, Set.empty)
    for (v <- toDelete) {
      // step 1: the marker goes first — the version turns torn/skippable
      assert(Files.deleteIfExists(Paths.get(s"$manual/v$v/_SUCCESS")))
      Files.deleteIfExists(Paths.get(s"$manual/v$v/._SUCCESS.crc"))
      assertServingInvariant(deleted, Set(v))
      // step 2: recursive delete is not atomic — part files vanish one
      // at a time; serving must keep skipping the unmarked remains
      val parts = new java.io.File(s"$manual/v$v").listFiles()
        .filter(_.getName.startsWith("part-"))
      assert(parts.nonEmpty)
      parts.headOption.foreach(f => assert(f.delete()))
      assertServingInvariant(deleted, Set(v))
      // step 3: the directory is gone
      val walk = Files.walk(Paths.get(s"$manual/v$v"))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally walk.close()
      deleted += v
      assertServingInvariant(deleted, Set.empty)
    }
    // the replayed sequence is the implementation's: same deletion set
    // and order, same survivors, same serving result
    assert(StreamOps.gcSnapshots(spark, twin, keepLast = 2)
      === toDelete.map(v => s"v$v"))
    def survivors(dir: String) = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.matches("v-?\\d+")).sorted.toSeq
    assert(survivors(twin) === survivors(manual))
    assert(rows(StreamOps.latestSnapshot(spark, twin).get) === vRows(3))
  }
}
