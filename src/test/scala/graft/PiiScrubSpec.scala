package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.PiiScrub

/** D34 PII detection + redaction, v2 classes (SURVEY.md §2) — q89 gates
  * the DuckDB replay end-to-end; these pin the scrub semantics on
  * PLANTED PII (the synthetic corpus contains none by construction, so
  * the planted rows are the only place the match-bearing branches are
  * exercised against a hand-computed expectation), including the
  * round-10 over-match traps: octet-range-violating dotted quads must
  * match nothing, Luhn-invalid card-shaped runs must be redacted but
  * not counted, and the version-string residual is pinned as the
  * DOCUMENTED no-lookaround limit, not an accident.
  */
class PiiScrubSpec extends AnyFunSuite {
  import SparkFixture._

  private def scrub(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("txt").select(PiiScrub.redact(col("txt"))).head.getString(0)
  }

  /** Engine-side counts (the native kernel struct). */
  private def counts(s: String): (Int, Int, Int, Int) = {
    import spark.implicits._
    val r = Seq(s).toDF("txt").select(
      PiiScrub.emailCount(col("txt")), PiiScrub.phoneCount(col("txt")),
      PiiScrub.ipCount(col("txt")), PiiScrub.luhnCardCount("txt")).head
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  /** Regex reference side: the guarded regexp_count / HOF-Luhn /
    * regexp_replace forms the kernel replaced (and the oracle replays).
    */
  private def countsRegex(s: String): (Int, Int, Int, Int) = {
    import spark.implicits._
    val r = Seq(s).toDF("txt").select(
      regexp_count(col("txt"), lit(PiiScrub.emailRe)),
      regexp_count(col("txt"), lit(PiiScrub.phoneRe)) +
        regexp_count(col("txt"), lit(PiiScrub.intlPhoneRe)),
      regexp_count(col("txt"), lit(PiiScrub.ipv4Re)) +
        regexp_count(col("txt"), lit(PiiScrub.ipv6Re)),
      PiiScrub.luhnCardCountRegex("txt")).head
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  private def scrubRegex(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("txt").select(PiiScrub.redactRegex(col("txt")))
      .head.getString(0)
  }

  test("D34 redacts each class with its typed placeholder") {
    assert(scrub("write to bob.smith+x@mail.example.co.uk today") ==
      "write to [EMAIL] today")
    assert(scrub("call 555-867-5309 now") == "call [PHONE] now")
    assert(scrub("or spaced 555 867 5309 or dotted 555.867.5309") ==
      "or spaced [PHONE] or dotted [PHONE]")
    assert(scrub("intl +44 20 7946 0958 and dense +15551234567") ==
      "intl [PHONE] and dense [PHONE]")
    assert(scrub("from 192.168.0.1 port 80") == "from [IP] port 80")
    assert(scrub("v6 2001:db8:85a3:0:0:8a2e:370:7334 short fe80::1 up") ==
      "v6 [IPV6] short [IPV6] up")
    assert(scrub("pay 4539-1488-0343-6467 or 4111 1111 1111 1111 ok") ==
      "pay [CARD] or [CARD] ok")
  }

  test("D34 redacts multiple and adjacent occurrences globally") {
    assert(scrub("a@b.co c@d.org 10.0.0.1 10.0.0.2 111-222-3333 444-555-6666")
      == "[EMAIL] [EMAIL] [IP] [IP] [PHONE] [PHONE]")
  }

  test("D34 chain order: composite identifiers are consumed whole, in order") {
    // the email is consumed whole by step 1; the standalone IP after it
    // is still caught
    assert(scrub("u123@h4.example.com at 8.8.8.8") == "[EMAIL] at [IP]")
    // an international number leaves before the NANP pattern could
    // nibble at its tail; a card-shaped run before the phone pattern
    assert(scrub("+1-555-123-4567 then 4539 1488 0343 6467") ==
      "[PHONE] then [CARD]")
  }

  test("D34 octet-range trap: dotted quads with octets > 255 match nothing") {
    val trap = "big 999.300.1.2 mid 256.1.1.1 ok 255.255.255.255"
    assert(scrub(trap) == "big 999.300.1.2 mid 256.1.1.1 ok [IP]")
    assert(counts(trap) == ((0, 0, 1, 0)))
  }

  test("D34 version-string residual is the documented no-lookaround behavior") {
    // a valid quad embedded in a LONGER dotted run still matches —
    // excluding it needs lookaround, outside the replayable subset;
    // pinned here so the contract is explicit
    assert(scrub("ver 1.2.3.4.5 done") == "ver [IP].5 done")
    // but a match can never START mid-digit-run (\b anchoring): the
    // leading "1234" cannot shed its first digit to become an octet
    assert(scrub("serial 1234.5.6.7 end") == "serial 1234.5.6.7 end")
    // ...while a valid quad AFTER a dot does match (the residual class)
    assert(scrub("serial 12345.5.6.7.8 end") == "serial 12345.[IP] end")
  }

  test("D34 Luhn gate: card-shaped runs redact conservatively, count precisely") {
    val t = "good 4539-1488-0343-6467 bad 4111 1111 1111 1112 short 123456789"
    assert(scrub(t) == "good [CARD] bad [CARD] short 123456789")
    assert(counts(t) == ((0, 0, 0, 1)))
    // 20+ digit runs are not card-shaped (no \b-consistent 13-19 split)
    assert(scrub("run 123456789012345678901234 x") ==
      "run 123456789012345678901234 x")
  }

  test("D34 redaction is idempotent") {
    val once = scrub("x a@b.io 1.2.3.4 123-456-7890 then +44 20 7946 0958 " +
      "pays 4539 1488 0343 6467 via 2001:db8:85a3:0:0:8a2e:370:7334 y")
    assert(once ==
      "x [EMAIL] [IP] [PHONE] then [PHONE] pays [CARD] via [IPV6] y")
    assert(scrub(once) == once)
  }

  test("D34 adjacency trap: two spaced numbers in a row never fuse into a card") {
    // the round-9 card-shape candidate '(?:[0-9][ -]?){12,18}[0-9]'
    // fused "3333 444-555-6666" into one card-shaped run; the grouped
    // form must not
    assert(scrub("10.0.0.2 111-222-3333 444-555-6666") ==
      "[IP] [PHONE] [PHONE]")
    // and an intl number directly before a grouped card is the one
    // ambiguity spaced formats cannot resolve — the intl pattern may
    // absorb the first group; with a word between, both parse cleanly
    assert(scrub("+44 20 7946 0958 pays 4111 1111 1111 1111") ==
      "[PHONE] pays [CARD]")
  }

  test("D34 clean text passes through unchanged, zero detections") {
    val clean = "no identifiers here, just words and the number 42 at 12:30"
    assert(scrub(clean) == clean)
    assert(counts(clean) == ((0, 0, 0, 0)))
  }

  test("D34 corpus is PII-free by construction (q89's zero-count rows)") {
    val docs = Tables.t(spark, sfDir, "documents")
    val hits = docs.select(
      sum(regexp_count(col("text"), lit(PiiScrub.emailRe))).as("e"),
      sum(regexp_count(col("text"), lit(PiiScrub.phoneRe)) +
        regexp_count(col("text"), lit(PiiScrub.intlPhoneRe))).as("p"),
      sum(regexp_count(col("text"), lit(PiiScrub.ipv4Re)) +
        regexp_count(col("text"), lit(PiiScrub.ipv6Re))).as("i"),
      sum(PiiScrub.luhnCardCount("text"))).head
    assert((hits.getLong(0), hits.getLong(1), hits.getLong(2),
      hits.getLong(3)) == ((0L, 0L, 0L, 0L)))
  }

  test("D34 audit rolls up planted rows against a plain-Scala reference") {
    import spark.implicits._
    val rows = Seq(
      ("g1", "mail a@b.co and 1.2.3.4"),
      ("g1", "phone 123-456-7890 twice 321-654-0987"),
      ("g2", "nothing to see"),
      ("g2", "c@d.io e@f.net 9.9.9.9 000-111-2222 card 4539148803436467"))
      .toDF("grp", "txt")
    val got = PiiScrub.piiAudit(rows, "grp", "txt")
      .select("grp", "n_rows", "emails", "phones", "ips", "cards")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      .toList
    assert(got == List(
      ("g1", 2L, 1L, 2L, 1L, 0L),
      ("g2", 2L, 2L, 1L, 1L, 1L)))
  }

  test("D34 q89's derived contact note carries the keyed classes plus the literal plants") {
    // the note built by q89 for a given custkey, derived independently
    // in plain Scala with the same integer arithmetic
    val k = 1234567L
    val note = s"Customer#001234567 <c$k@mail.example.com> ph " +
      s"${200 + k % 700}-${100 + (k * 7919) % 900}-${1000 + (k * 104729) % 9000}" +
      s" ip 10.${k % 256}.${(k * 31) % 256}.${1 + (k * 17) % 254}" +
      " intl +44 20 7946 0958 card 4539-1488-0343-6467" +
      " bad 4111 1111 1111 1112" +
      " ip6 2001:db8:85a3:0:0:8a2e:370:7334" +
      " ver 1.2.3.4.5 big 999.300.1.2" +
      " grp 55555 44444 333 end"
    // emails 1; phones = keyed NANP + intl = 2; ips = keyed v4 +
    // version residual + v6 = 3; cards: 2 card-shaped, 1 Luhn-valid;
    // the 5-5-3 grouping trap (round 11) matches NOTHING — the rejected
    // digits-with-any-separators card shape would have fused it
    assert(counts(note) == ((1, 2, 3, 1)))
    assert(scrub(note) ==
      "Customer#001234567 <[EMAIL]> ph [PHONE] ip [IP]" +
      " intl [PHONE] card [CARD] bad [CARD]" +
      " ip6 [IPV6] ver [IP].5 big 999.300.1.2" +
      " grp 55555 44444 333 end")
  }

  test("D34 kernel == regex forms on every planted class (round-11 native scan)") {
    val plants = Seq(
      "write to bob.smith+x@mail.example.co.uk today",
      "a@b.co c@d.org 10.0.0.1 10.0.0.2 111-222-3333 444-555-6666",
      "u123@h4.example.com at 8.8.8.8",
      "x@y.comabc@d.org and a@b.cd.ef-x tails",
      "+1-555-123-4567 then 4539 1488 0343 6467",
      "intl +44 20 7946 0958 and dense +15551234567 and +12 345678 ok",
      "big 999.300.1.2 mid 256.1.1.1 ok 255.255.255.255",
      "ver 1.2.3.4.5 done serial 1234.5.6.7 end serial 12345.5.6.7.8 end",
      "good 4539-1488-0343-6467 bad 4111 1111 1111 1112 short 123456789",
      "run 123456789012345678901234 x grp 55555 44444 333 end",
      "v6 2001:db8:85a3:0:0:8a2e:370:7334 short fe80::1 up 1:2:3:4:5:6:7:8:9",
      "deadbeefcafe:: 1:: ::1 a:b::c:2g xface:1 _0:1::2",
      "no identifiers here, just words and the number 42 at 12:30",
      "unicode édge 1.2.3.4é café@b.co é8.8.8.8 phé 555-123-4567",
      "")
    plants.foreach { s =>
      assert(counts(s) == countsRegex(s), s"counts diverge on <$s>")
      assert(scrub(s) == scrubRegex(s), s"redaction diverges on <$s>")
    }
  }

  test("D34 kernel == java.util.regex chain on fuzzed PII-shaped inputs") {
    import java.util.regex.Pattern
    val pats = Seq(PiiScrub.emailRe, PiiScrub.intlPhoneRe, PiiScrub.cardRe,
      PiiScrub.phoneRe, PiiScrub.ipv4Re, PiiScrub.ipv6Re).map(Pattern.compile)
    val phs = Seq("[EMAIL]", "[PHONE]", "[CARD]", "[PHONE]", "[IP]", "[IPV6]")
    def refRedact(s: String): String =
      pats.zip(phs).foldLeft(s) { case (t, (p, ph)) =>
        p.matcher(t).replaceAll(ph) } // placeholders contain no $ or \
    def refCount(s: String, p: Pattern): Int = {
      val m = p.matcher(s); var c = 0
      while (m.find()) c += 1
      c
    }
    def refLuhnCount(s: String): Int = {
      val m = pats(2).matcher(s); var c = 0
      while (m.find()) {
        val d = m.group.filter(_.isDigit).reverse
        val sum = d.zipWithIndex.map { case (ch, i0) =>
          val v = ch - '0'
          if ((i0 + 1) % 2 == 1) v else 2 * v - (if (v > 4) 9 else 0)
        }.sum
        if (sum % 10 == 0) c += 1
      }
      c
    }
    // alphabet tuned to the pattern family's needles, separators, word/
    // non-word boundary chars, hex letters, and multibyte word chars —
    // including a 4-byte supplementary letter (𝐀 U+1D400, a surrogate
    // pair) so the kernel's per-code-unit \b replay of Java semantics is
    // fuzzed, not just asserted
    val alpha = "0123456789abf:.- @+_%gé世".map(_.toString) :+ "𝐀"
    val rnd = new scala.util.Random(4111)
    val samples = (1 to 600).map { _ =>
      val len = 1 + rnd.nextInt(40)
      Array.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
    } ++ Seq("4539148803436467", "+1 23 45 67 89 01", "1.2.3.4.5.6.7.8",
      "00:11:22:33:44:55:66:77:88", "1234 5678 9012 34567",
      "𝐀4539148803436467", "4539148803436467𝐀",
      "𝐀192.168.1.1 1234 5678 9012 3456𝐀")
    samples.foreach { s =>
      val k = counts(s)
      val e = (refCount(s, pats.head),
        refCount(s, pats(3)) + refCount(s, pats(1)),
        refCount(s, pats(4)) + refCount(s, pats(5)),
        refLuhnCount(s))
      assert(k == e, s"counts diverge on <$s>")
      assert(scrub(s) == refRedact(s), s"redaction diverges on <$s>")
    }
  }
}
