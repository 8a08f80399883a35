package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def files = Seq(
    // key p: sizes 3,3,3,3 with target 6 → bins 0,0,1,1
    ("p", 1L, 3L), ("p", 2L, 3L), ("p", 3L, 3L), ("p", 4L, 3L),
    // key q: an oversized file still lands alone in its own bin
    ("q", 1L, 2L), ("q", 2L, 100L), ("q", 3L, 2L))
    .toDF("k", "id", "bytes")

  test("greedy sequential bins: floor(prior / target)") {
    val bins = Compaction.assignBins(files, "k", "id", "bytes", 6L)
      .select($"k", $"id", $"bin").as[(String, Long, Long)].collect().toSet
    assert(bins === Set(
      ("p", 1L, 0L), ("p", 2L, 0L), ("p", 3L, 1L), ("p", 4L, 1L),
      ("q", 1L, 0L), ("q", 2L, 0L), ("q", 3L, 17L)))
  }

  test("manifest aggregates per bin with ordered id range") {
    val m = Compaction.manifest(files, "k", "id", "bytes", 6L)
      .filter($"k" === "p").orderBy($"bin")
      .select($"bin", $"n_files", $"total_bytes", $"first_id", $"last_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(m.toSeq === Seq((0L, 2L, 6L, 1L, 2L), (1L, 2L, 6L, 3L, 4L)))
  }

  test("incrementalManifest replans only partitions the delta touched") {
    val delta = Seq(("p", 9L, 3L)).toDF("k", "id", "bytes")
    val m = Compaction.incrementalManifest(files, delta, "k", "id", "bytes", 6L)
    // key q received nothing → absent from the incremental output
    assert(m.filter($"k" === "q").count() === 0)
    val p = m.filter($"k" === "p").orderBy($"bin")
      .select($"bin", $"n_files", $"n_new", $"total_bytes")
      .as[(Long, Long, Long, Long)].collect()
    // old p bins unchanged (delta appends after max id); new file lands
    // in bin floor(12/6) = 2
    assert(p.toSeq === Seq((0L, 2L, 0L, 6L), (1L, 2L, 0L, 6L), (2L, 1L, 1L, 3L)))
  }

  test("incremental result equals a full re-plan restricted to affected keys") {
    val delta = Seq(("p", 0L, 5L)).toDF("k", "id", "bytes") // sorts FIRST
    val inc = Compaction.incrementalManifest(files, delta, "k", "id", "bytes", 6L)
      .select($"k", $"bin", $"n_files", $"total_bytes")
      .as[(String, Long, Long, Long)].collect().toSet
    val full = Compaction.manifest(
      files.unionByName(delta).filter($"k" === "p"), "k", "id", "bytes", 6L)
      .select($"k", $"bin", $"n_files", $"total_bytes")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(inc === full) // an early-sorting delta file reshuffles p's bins
  }

  test("bins never mix partition keys and overshoot by at most one file") {
    val m = Compaction.assignBins(files, "k", "id", "bytes", 6L)
      .groupBy($"k", $"bin").agg(sum($"bytes").as("b"), max($"bytes").as("mx"))
      .select($"b", $"mx").as[(Long, Long)].collect()
    // total ≤ target + largest file in the bin (greedy overshoot bound)
    assert(m.forall { case (b, mx) => b <= 6L + mx })
  }
}
