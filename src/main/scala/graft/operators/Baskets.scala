package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence building blocks (q111): per-key sorted
  * distinct item arrays, and narrow C(n,2) pair generation from them.
  *
  * Scale design: pair generation per basket is quadratic in BASKET size
  * by definition, so an unbounded basket is the classic market-basket
  * skew bomb — one pathological 100k-item basket would emit 5×10⁹ pair
  * rows from a single task (straggler/OOM at scale even though every
  * normal basket is tiny). Standard frequent-itemset practice drops
  * mega-baskets (they carry no itemset signal — a basket holding half
  * the catalog co-occurs with everything); [[baskets]] enforces that
  * cap at build time, so downstream pair output is bounded by
  * C(maxItems, 2) per basket REGARDLESS of input skew. The drop is not
  * silent: an `observe` metric (CollectMetrics — computed inside the
  * same job, zero extra scans) counts dropped baskets, and
  * [[graft.GraftSession]]-built sessions log every `graft.*` observed
  * metric on query completion.
  */
object Baskets {

  /** Default basket-size cap: C(64,2) = 2016 pairs per basket at most.
    * Far above any organic order size (sf0.1 max is 7 distinct parts)
    * and far below the single-task blow-up zone. */
  val DefaultMaxItems = 64

  /** Collapse an (key, item) relation into one row per key holding the
    * sorted distinct item array, dropping baskets with more than
    * `maxItems` distinct items. One shuffle (on the basket key); the
    * dropped-basket count rides the job as observed metric
    * `<metricName>.n_dropped_baskets`. */
  def baskets(items: DataFrame, key: String, item: String,
      maxItems: Int = DefaultMaxItems,
      metricName: String = "graft.baskets"): DataFrame = {
    require(maxItems >= 2, "a basket cap below 2 admits no pairs at all")
    items
      .select(col(key).as("ok"), col(item).as("pk"))
      .groupBy(col("ok"))
      .agg(sort_array(array_distinct(collect_list(col("pk")))).as("pks"))
      .observe(metricName,
        sum(when(size(col("pks")) > maxItems, 1L).otherwise(0L))
          .as("n_dropped_baskets"))
      .filter(size(col("pks")) <= maxItems)
  }

  /** C(n,2) pairs per basket, generated NARROWLY: posexplode the basket,
    * then pair element i with every later element via a second explode
    * of `slice(pks, i+2, …)` — arrays are sorted, so part_a < part_b.
    * Two codegen'd Generate nodes, not a nested transform HOF (HOFs run
    * interpreted, ~10× slower per element). Output: (part_a, part_b,
    * n_ab) — one row per co-occurring pair with its basket count. */
  def pairCounts(baskets: DataFrame): DataFrame =
    baskets
      .select(col("pks"), posexplode(col("pks")).as(Seq("i", "part_a")))
      .select(col("part_a"),
        explode(slice(col("pks"), col("i") + 2, size(col("pks")))).as("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_ab"))
}
