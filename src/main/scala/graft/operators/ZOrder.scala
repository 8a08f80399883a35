package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * technique behind lakehouse `OPTIMIZE ZORDER BY` (Morton 1966; used by
  * Delta Lake / Iceberg for data skipping): interleaving the bits of
  * several key columns gives a 1-D sort key under which rows close in
  * ANY keyed dimension land close in the file layout, so min/max
  * per-file statistics prune scans for predicates on EITHER column —
  * unlike a lexicographic sort, which only prunes its leading column.
  *
  * Everything here is built-in bit arithmetic (`shiftleft`/`&`/`|`):
  * codegen'd, no UDF, and exactly reproducible in any engine — the
  * oracle replicates the spread with the same magic masks.
  */
object ZOrder {

  /** The classic 16→32-bit Morton spread: insert a 0 bit between
    * consecutive bits of the low 16 bits of `c`. */
  def spread16(c: Column): Column = {
    var v = c.cast("long").bitwiseAND(lit(0xFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x33333333L))
    v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x55555555L))
    v
  }

  /** Morton interleave of two dimensions (each using its low 16 bits):
    * z = x₀y₀x₁y₁… as a 32-bit value. */
  def zValue2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Re-lay a relation out along the Z-curve of two key columns:
    * range-partition by the interleaved value (contiguous, disjoint
    * z-ranges per output partition — what makes per-file min/max stats
    * selective for both keys), then sort within partitions so row
    * groups inside each file stay clustered too. This is the write-side
    * operator: `zorderRepartition(df, "a", "b", n).write.parquet(...)`.
    */
  def zorderRepartition(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int): DataFrame = {
    val z = zValue2(col(xCol), col(yCol)).as("_zorder")
    df.withColumn("_zorder", z)
      .repartitionByRange(numPartitions, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")
  }
}
