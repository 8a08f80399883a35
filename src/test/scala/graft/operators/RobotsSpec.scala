package graft.operators

import graft.SparkSpec

/** RFC 9309 longest-match semantics `Robots.evaluate` must hold
  * (q156's oracle replays the same rules relationally; these pin the
  * SEMANTICS against hand-derived verdicts). */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def rules = Seq(
    ("a.com", "/private", false),
    ("a.com", "/private/ok", true),
    ("a.com", "/p", false),
    ("b.com", "/private", true) // same path, other domain: isolated
  ).toDF("domain", "rp", "allow")

  private def verdicts(urls: Seq[(Long, String, String)]): Map[Long, Boolean] =
    Robots.evaluate(urls.toDF("url_id", "domain", "path"), rules)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap

  test("longest matching prefix wins; Allow overrides its Disallow parent") {
    val got = verdicts(Seq(
      (1L, "a.com", "/private/x"),      // /private (8) beats /p (2) → blocked
      (2L, "a.com", "/private/ok/x"),   // /private/ok (11) → allowed
      (3L, "a.com", "/public"),         // only /p matches → blocked
      (4L, "a.com", "/other")))         // no rule → allowed by default
    assert(got === Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))
  }

  test("domains are isolated; equal-length tie goes to Allow") {
    val got = verdicts(Seq(
      (1L, "b.com", "/private/x"),      // b.com's /private is an Allow
      (2L, "c.com", "/private/x")))     // no rules at all for c.com
    assert(got === Map(1L -> true, 2L -> true))
    // explicit tie: same-length Allow + Disallow on one path
    val tie = Seq(("t.com", "/dir", false), ("t.com", "/dir", true))
      .toDF("domain", "rp", "allow")
    val v = Robots.evaluate(
        Seq((9L, "t.com", "/dir/page")).toDF("url_id", "domain", "path"), tie)
      .collect().head.getBoolean(3)
    assert(v === true)
  }

  test("rule match is a path PREFIX, not a substring") {
    val got = verdicts(Seq(
      (1L, "a.com", "/x/private/y"),    // /private not a prefix → only no rule... /p neither
      (2L, "a.com", "/pq")))            // /p IS a prefix of /pq → blocked
    assert(got === Map(1L -> true, 2L -> false))
  }
}
