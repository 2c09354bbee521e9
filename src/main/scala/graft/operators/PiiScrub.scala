package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D34: PII detection + redaction over a text corpus — the corpus-
  * curation pass every public training-data pipeline runs before
  * anything else touches the text (C4 strips lines by blocklist,
  * CCNet/Dolma-class pipelines mask emails / phone numbers / IP
  * addresses with typed placeholder tokens so downstream dedup and
  * model training never see the raw identifier).
  *
  * Contract:
  *   - DETECTION counts each pattern class on the RAW text (the audit
  *     numbers a curation report carries — how much PII the corpus had,
  *     not how much survived earlier redactions).
  *   - REDACTION is a fixed-order chain (email -> phone -> IPv4), each
  *     step a full-text global replace with a typed placeholder. Order
  *     is part of the contract: an email's digit runs must leave the
  *     text before any naked number pattern scans it. The chain is
  *     idempotent (placeholders contain no pattern-matchable text) —
  *     PiiScrubSpec pins it.
  *   - Patterns use the regex intersection both engines compile the
  *     same way (character classes + bounded counts; no backreferences,
  *     no lookaround — Java regex and RE2 agree on this subset), so the
  *     DuckDB oracle replays the scrub bit-for-bit.
  *
  * Scale shape (§5): both detection and redaction are SCAN-LOCAL
  * projections — whole-stage-codegen'd regex evaluation in the row,
  * zero joins, zero aggregation state before the final per-group
  * rollup (a handful of groups => one tiny partial-agg shuffle). At
  * 100 TB this is embarrassingly parallel: cost is exactly one pass
  * over the text bytes per pattern, the floor for any scrubber.
  */
object PiiScrub {

  /** Pattern classes — the Java-regex/RE2 common subset (see scaladoc). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** The fixed-order global-replace chain (email -> phone -> IPv4). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]"),
      ipv4Re, "[IP]")

  /** Per-group PII audit: detection counts per class on the raw text,
    * plus two redaction gates — total redacted length and a 24-bit
    * md5-prefix checksum of every redacted row (24 bits, not the usual
    * 48: the checksum is SUMMED per group, and 2^48-scale addends
    * overflow BIGINT past ~30k rows — the dsum width-ceiling rule.
    * 2^24-scale addends are exact to ~5e11 rows on both engines).
    *
    * Input: (grp, txt) rows; output one row per grp ordered by grp.
    */
  def piiAudit(rows: DataFrame, grpCol: String, textCol: String): DataFrame = {
    val txt = col(textCol)
    val h24 = shiftright(
      graft.functions.GraftFunctions.md5Prefix48(redact(txt)), 24)
    rows
      .groupBy(col(grpCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(regexp_count(txt, lit(emailRe)).cast("long")).as("emails"),
        sum(regexp_count(txt, lit(phoneRe)).cast("long")).as("phones"),
        sum(regexp_count(txt, lit(ipv4Re)).cast("long")).as("ips"),
        sum(length(redact(txt)).cast("long")).as("redacted_chars"),
        sum(h24).as("redact_sum"))
      .orderBy(col(grpCol))
  }
}
