package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.PiiScrub

/** D34 PII detection + redaction (SURVEY.md §2) — q89 gates the DuckDB
  * replay end-to-end; these pin the scrub semantics on PLANTED PII
  * (the synthetic corpus contains none by construction, so the planted
  * rows are the only place the match-bearing branches are exercised
  * against a hand-computed expectation).
  */
class PiiScrubSpec extends AnyFunSuite {
  import SparkFixture._

  private def scrub(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("txt").select(PiiScrub.redact(col("txt"))).head.getString(0)
  }

  test("D34 redacts each class with its typed placeholder") {
    assert(scrub("write to bob.smith+x@mail.example.co.uk today") ==
      "write to [EMAIL] today")
    assert(scrub("call 555-867-5309 now") == "call [PHONE] now")
    assert(scrub("from 192.168.0.1 port 80") == "from [IP] port 80")
  }

  test("D34 redacts multiple and adjacent occurrences globally") {
    assert(scrub("a@b.co c@d.org 10.0.0.1 10.0.0.2 111-222-3333 444-555-6666")
      == "[EMAIL] [EMAIL] [IP] [IP] [PHONE] [PHONE]")
  }

  test("D34 chain order: an email's digits never leak into number scans") {
    // the email is consumed whole by step 1; the standalone IP after it
    // is still caught by step 3
    assert(scrub("u123@h4.example.com at 8.8.8.8") == "[EMAIL] at [IP]")
  }

  test("D34 redaction is idempotent") {
    val once = scrub("x a@b.io 1.2.3.4 123-456-7890 y")
    assert(once == "x [EMAIL] [IP] [PHONE] y")
    assert(scrub(once) == once)
  }

  test("D34 clean text passes through unchanged, zero detections") {
    import spark.implicits._
    val clean = "no identifiers here, just words and the number 42"
    assert(scrub(clean) == clean)
    val counts = Seq(clean).toDF("txt").select(
      regexp_count(col("txt"), lit(PiiScrub.emailRe)),
      regexp_count(col("txt"), lit(PiiScrub.phoneRe)),
      regexp_count(col("txt"), lit(PiiScrub.ipv4Re))).head
    assert((counts.getInt(0), counts.getInt(1), counts.getInt(2)) == ((0, 0, 0)))
  }

  test("D34 corpus is PII-free by construction (q89's zero-count rows)") {
    val docs = Tables.t(spark, sfDir, "documents")
    val hits = docs.select(
      sum(regexp_count(col("text"), lit(PiiScrub.emailRe))).as("e"),
      sum(regexp_count(col("text"), lit(PiiScrub.phoneRe))).as("p"),
      sum(regexp_count(col("text"), lit(PiiScrub.ipv4Re))).as("i")).head
    assert((hits.getLong(0), hits.getLong(1), hits.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("D34 audit rolls up planted rows against a plain-Scala reference") {
    import spark.implicits._
    val rows = Seq(
      ("g1", "mail a@b.co and 1.2.3.4"),
      ("g1", "phone 123-456-7890 twice 321-654-0987"),
      ("g2", "nothing to see"),
      ("g2", "c@d.io e@f.net 9.9.9.9 000-111-2222")).toDF("grp", "txt")
    val got = PiiScrub.piiAudit(rows, "grp", "txt")
      .select("grp", "n_rows", "emails", "phones", "ips")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    assert(got == List(
      ("g1", 2L, 1L, 2L, 1L),
      ("g2", 2L, 2L, 1L, 1L)))
  }

  test("D34 q89's derived contact note carries exactly one of each class") {
    // the note built by q89 for a given custkey, derived independently
    // in plain Scala with the same integer arithmetic
    val k = 1234567L
    val note = s"Customer#001234567 <c$k@mail.example.com> ph " +
      s"${200 + k % 700}-${100 + (k * 7919) % 900}-${1000 + (k * 104729) % 9000}" +
      s" ip 10.${k % 256}.${(k * 31) % 256}.${1 + (k * 17) % 254}"
    import spark.implicits._
    val c = Seq(note).toDF("txt").select(
      regexp_count(col("txt"), lit(PiiScrub.emailRe)),
      regexp_count(col("txt"), lit(PiiScrub.phoneRe)),
      regexp_count(col("txt"), lit(PiiScrub.ipv4Re))).head
    assert((c.getInt(0), c.getInt(1), c.getInt(2)) == ((1, 1, 1)))
    assert(scrub(note) ==
      "Customer#001234567 <[EMAIL]> ph [PHONE] ip [IP]")
  }
}
