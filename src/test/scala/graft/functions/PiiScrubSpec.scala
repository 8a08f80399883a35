package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextFns.scrubPii(col("t"))).as[String].head()

  test("redacts emails, IPv4s, and phone numbers with typed placeholders") {
    assert(scrub("mail me at jo.doe+spam@mail.example.org today") ===
      "mail me at <EMAIL> today")
    assert(scrub("server 192.168.0.1 then 10.0.73.115") === "server <IP> then <IP>")
    assert(scrub("call +1-555-0042 now") === "call <PHONE> now")
  }

  test("email wins over the narrower patterns inside its own span") {
    // local part carries digits+dots an IP/phone scan could chew into
    assert(scrub("x 10.0.0.1@host.example.com y") === "x <EMAIL> y")
  }

  test("leaves clean text untouched") {
    val s = "version 1.2 costs 3 dollars at example.com" // no @, no 4th octet
    assert(scrub(s) === s)
  }

  test("scrubbing is idempotent") {
    val once = scrub("a@b.co 1.2.3.4 +1-555-0000")
    assert(scrub(once) === once)
  }
}
