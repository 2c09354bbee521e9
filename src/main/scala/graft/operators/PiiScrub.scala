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
  *     not how much survived earlier redactions). Classes are counted
  *     independently: a dashed NANP number inside an international
  *     number counts in both classes by design. Card detection is
  *     LUHN-GATED (exact integer arithmetic on the digit run, replayed
  *     by the oracle) — only check-digit-valid runs count.
  *   - REDACTION is a fixed-order chain (email -> intl phone -> card ->
  *     NANP phone -> IPv4 -> IPv6), each step a full-text global
  *     replace with a typed placeholder. Order is part of the contract:
  *     an email's digit runs must leave the text before any naked
  *     number pattern scans it, an international number before its
  *     NANP tail is seen, a card-shaped run before the phone pattern
  *     could nibble at it. Card REDACTION is deliberately conservative
  *     (every card-shaped run, Luhn-valid or not, is masked — the
  *     over-redact-never-leak rule); only detection is Luhn-precise.
  *     The chain is idempotent (placeholders contain no
  *     pattern-matchable text) — PiiScrubSpec pins it.
  *   - Patterns use the regex intersection both engines compile the
  *     same way (character classes, bounded counts, alternation,
  *     non-capturing groups, ASCII \b word boundaries; no
  *     backreferences, no lookaround — Java regex and RE2 agree on this
  *     subset over ASCII text), so the DuckDB oracle replays the scrub
  *     bit-for-bit.
  *   - Round-10 widening (r9 verdict task 3): IPv4 octets are
  *     range-checked (0-255 — version strings like 999.300.1.2 no
  *     longer match) and \b-anchored; phones cover dashed/dotted/spaced
  *     NANP plus +-prefixed international (E.164-style with grouped
  *     separators); IPv6 covers the full 8-group form and ::-compressed
  *     forms with a leading group; Luhn-gated cards are new. KNOWN
  *     RESIDUAL: a valid IPv4 embedded in a LONGER dotted run
  *     ("1.2.3.4.5" -> "[IP].5") still matches, because excluding it
  *     needs lookaround — outside the replayable subset. The spec pins
  *     this as documented behavior, not an accident.
  *
  * Scale shape (§5): both detection and redaction are SCAN-LOCAL
  * projections — whole-stage-codegen'd regex evaluation in the row,
  * zero joins, zero aggregation state before the final per-group
  * rollup (a handful of groups => one tiny partial-agg shuffle). The
  * Luhn gate adds per-MATCH integer folds (higher-order functions over
  * ≤19 digits), paid only on card-shaped runs. At 100 TB this is
  * embarrassingly parallel: cost is one pass over the text bytes per
  * pattern, the floor for any scrubber.
  */
object PiiScrub {

  /** Pattern classes — the Java-regex/RE2 common subset (see scaladoc). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** NANP with dashed/dotted/spaced separators, \b-anchored. */
  val phoneRe = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
  /** +-prefixed international: country code + 2-4 separator-grouped
    * digit blocks (E.164 densest form "+15551234567" included).
    */
  val intlPhoneRe = "\\+[0-9]{1,3}[-. ]?[0-9]{2,4}(?:[-. ]?[0-9]{2,4}){1,3}\\b"
  /** Card-shaped run: a bare 13-19 digit run, or the 4-4-4-(2-4)
    * grouped form with space/dash separators. Redaction masks ALL of
    * these; detection Luhn-gates. Deliberately NOT "any digits with any
    * separators": that shape also matches runs of ADJACENT
    * space-separated numbers (two phone numbers in a row), which is an
    * over-redaction class worse than missing exotic groupings like
    * Amex 4-6-5 (documented out of scope).
    */
  val cardRe =
    "\\b(?:[0-9]{13,19}|[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{2,4})\\b"
  /** Range-checked dotted quad (each octet 0-255), \b-anchored. */
  private val oct = "(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
  val ipv4Re = s"\\b(?:$oct\\.){3}$oct\\b"
  /** Full 8-group IPv6 plus ::-compressed forms with a leading group. */
  val ipv6Re = "\\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\\b|" +
    "\\b(?:[0-9A-Fa-f]{1,4}:){1,6}:(?:[0-9A-Fa-f]{1,4}:){0,5}[0-9A-Fa-f]{1,4}\\b"

  /** Cheap needle pre-filter: every class REQUIRES at least one of
    * '@' (email), '+' (intl phone), ':' (IPv6), or a digit (phones,
    * cards, IPv4) — a row containing none of them cannot match
    * anything, so the whole chain/count is skipped after one trivial
    * char-class scan. Soundness note for the per-class guards below:
    * they read the ORIGINAL text, and no placeholder re-introduces a
    * needle an earlier step consumed ([EMAIL]/[PHONE]/[CARD]/[IP]
    * contain no '@'/'+'/':'/digits; [IPV6]'s '6' lands only at the
    * chain's last step), so "needle absent from raw text" implies
    * "class matches nothing at its step" at every position in the
    * chain. This is the production shape — cheap literal gates before
    * expensive regex — and it is what keeps the scrubber at one fast
    * pass over the (mostly clean) corpus bytes instead of
    * passes-per-class: Java's backtracking engine pays ~8x RE2 on the
    * alternation-heavy classes, so skipping clean rows matters.
    */
  private val needleRe = "[@+:0-9]"

  /** The whole scan (detection counts + redaction) as ONE native kernel
    * evaluation — org.apache.spark.sql.graft.PiiKernel replays every
    * pattern's java.util.regex semantics bit-for-bit (round-11 fix for
    * the v2 classes' ~13 backtracking-regex passes per PII-dense row;
    * PiiScrubSpec pins kernel == regex forms on plants and fuzz).
    */
  def piiScan(text: Column): Column =
    graft.functions.GraftFunctions.piiScan(text)

  /** The fixed-order global-replace chain (see contract) — native kernel;
    * `redactRegex` below keeps the regexp_replace form the DuckDB oracle
    * replays (and the spec pins the two identical).
    */
  def redact(text: Column): Column = piiScan(text).getField("red")

  /** The regexp_replace reference form of the chain (oracle/spec side). */
  def redactRegex(text: Column): Column =
    when(text.rlike(needleRe),
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(text, emailRe, "[EMAIL]"),
                intlPhoneRe, "[PHONE]"),
              cardRe, "[CARD]"),
            phoneRe, "[PHONE]"),
          ipv4Re, "[IP]"),
        ipv6Re, "[IPV6]"))
    .otherwise(text)

  /** Per-class detection counts on raw text — kernel struct fields
    * (identical columns collapse to one kernel call under Spark's
    * subexpression elimination; the guarded regexp_count forms they
    * replaced remain the spec/oracle reference).
    */
  def emailCount(text: Column): Column = piiScan(text).getField("emails")
  def phoneCount(text: Column): Column = piiScan(text).getField("phones")
  def ipCount(text: Column): Column = piiScan(text).getField("ips")

  /** Luhn-valid card-shaped runs (kernel; see `luhnCardCountRegex` for
    * the HOF form the DuckDB oracle replays).
    */
  def luhnCardCount(textCol: String): Column =
    piiScan(col(textCol)).getField("cards")

  /** The guarded HOF reference form of the Luhn count (spec/oracle side):
    * extract all card-shaped matches, strip separators, reverse, and sum
    * the doubled-every-second-digit contributions — valid iff
    * sum % 10 = 0. Exact integer arithmetic end to end.
    */
  def luhnCardCountRegex(textCol: String): Column =
    when(col(textCol).rlike("[0-9]"), luhnCardCountRaw(textCol))
      .otherwise(lit(0))

  private def luhnCardCountRaw(textCol: String): Column = expr(
    // Spark's SQL parser escape-processes string literals, so the
    // pattern's backslashes must be doubled inside the expr text
    s"""size(filter(
         transform(regexp_extract_all(`$textCol`, '${cardRe.replace("\\", "\\\\")}', 0),
           m -> reverse(regexp_replace(m, '[ -]', ''))),
         d -> aggregate(
           transform(sequence(1, length(d)),
             i -> CASE WHEN i % 2 = 1 THEN ascii(substring(d, i, 1)) - 48
                  ELSE 2 * (ascii(substring(d, i, 1)) - 48)
                       - CASE WHEN ascii(substring(d, i, 1)) - 48 > 4
                              THEN 9 ELSE 0 END END),
           0, (acc, x) -> acc + x) % 10 = 0))""")

  /** Per-group PII audit: detection counts per class on the raw text
    * (phones = NANP + international, ips = v4 + v6, cards Luhn-gated),
    * plus two redaction gates — total redacted length and a 24-bit
    * md5-prefix checksum of every redacted row (24 bits, not the usual
    * 48: the checksum is SUMMED per group, and 2^48-scale addends
    * overflow BIGINT past ~30k rows — the dsum width-ceiling rule.
    * 2^24-scale addends are exact to ~5e11 rows on both engines).
    *
    * Input: (grp, txt) rows; output one row per grp ordered by grp.
    */
  def piiAudit(rows: DataFrame, grpCol: String, textCol: String): DataFrame = {
    // the whole scan (counts + six-step redact chain) is ONE kernel
    // evaluation per row: project the struct first so every aggregate
    // reads fields of the same attribute (the projection's output is
    // referenced six times, so the optimizer cannot inline-duplicate it)
    rows
      .select(col(grpCol), piiScan(col(textCol)).as("_pii"))
      .groupBy(col(grpCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("_pii.emails").cast("long")).as("emails"),
        sum(col("_pii.phones").cast("long")).as("phones"),
        sum(col("_pii.ips").cast("long")).as("ips"),
        sum(col("_pii.cards").cast("long")).as("cards"),
        sum(length(col("_pii.red")).cast("long")).as("redacted_chars"),
        sum(shiftright(
          graft.functions.GraftFunctions.md5Prefix48(col("_pii.red")), 24))
          .as("redact_sum"))
      .orderBy(col(grpCol))
  }
}
