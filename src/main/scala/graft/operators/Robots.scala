package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt rule evaluation — the compliance gate every polite crawl
  * runs before fetching (the reference obeys it via Scrapy's
  * ROBOTSTXT_OBEY, settings.py:22; SURVEY §3.1 step 2). Implements the
  * RFC 9309 longest-match core: among the rules whose path is a PREFIX
  * of the URL path, the longest wins, an Allow beats a Disallow of the
  * same length, and a URL matching no rule is allowed. (Wildcard `*`
  * and anchor `$` patterns are out of scope — the prefix subset is the
  * spec's normative base and what the synthetic rule sets exercise.)
  *
  * Scale shape: rules tables are tiny (a robots.txt is a few KB — the
  * table is O(domains × rules/domain)), so the urls⋈rules equi-join on
  * the domain broadcasts the rule side under AQE; the winner pick is
  * one url-keyed window over ≤ rules/domain candidate rows per URL.
  * Nothing scales with corpus size except the one pass over the URLs.
  *
  * @param urls  (url_id, domain, path)
  * @param rules (domain, rp, allow) — rp is the rule's path prefix
  * @return urls + `allowed` boolean
  */
object Robots {

  def evaluate(urls: DataFrame, rules: DataFrame): DataFrame = {
    val cand = urls.select(col("url_id"), col("domain"), col("path"))
      .join(rules, Seq("domain"))
      .filter(col("path").startsWith(col("rp")))
    val win = cand
      .withColumn("rn", row_number().over(Window.partitionBy(col("url_id"))
        .orderBy(length(col("rp")).desc, when(col("allow"), 0).otherwise(1))))
      .filter(col("rn") === 1)
      .select(col("url_id"), col("allow"))
    urls.join(win, Seq("url_id"), "left")
      .withColumn("allowed", coalesce(col("allow"), lit(true)))
      .drop("allow")
  }
}
