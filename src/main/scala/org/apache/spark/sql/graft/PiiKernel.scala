package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-pattern PII scanner — the whole D34 contract
  * (operators/PiiScrub.scala: five detection classes on raw text with a
  * Luhn-gated card class, plus the fixed-order six-step global-replace
  * chain) in ONE kernel call per row instead of ~13 Java
  * backtracking-regex passes (the round-10 verdict's one compute-weak
  * row: Java's regex engine pays ~65 ns/char/pattern on the
  * alternation-heavy v2 classes vs ~1-2 ns/char for these hand-compiled
  * scanners — the q39 regexTokenCount precedent, widened to the full
  * pattern family).
  *
  * EXACTNESS CONTRACT: every scanner replays its java.util.regex
  * pattern's find/replaceAll semantics bit-for-bit — leftmost-first
  * alternation, greedy bounded quantifiers with backtracking,
  * non-overlapping matches resuming at each match end, and Java's
  * DEFAULT \b (word chars = ASCII [0-9A-Za-z_] plus
  * Character.isLetterOrDigit of the decoded CODE POINT for non-ASCII —
  * Java's Bound node reads codePointBefore/codePointAt, so supplementary
  * letters count as word chars). Each replace pass scans the unmodified
  * input of THAT pass
  * (as Matcher.replaceAll does), so the chain composes identically.
  * PiiScrubSpec pins the kernel against the regexp_count / regexp_replace
  * forms on all planted classes AND against an independent
  * java.util.regex replay on fuzzed inputs.
  *
  * Patterns are ASCII-only classes, so byte-level scanning over UTF-8 is
  * exact: bytes >= 0x80 belong to no class, match spans never split a
  * multibyte char, and only \b checks ever decode a codepoint.
  */
object PiiKernel {

  // ---- ASCII byte classes -------------------------------------------------
  @inline private def digit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def hexc(b: Byte): Boolean =
    digit(b) || (b >= 'A' && b <= 'F') || (b >= 'a' && b <= 'f')
  @inline private def letter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  @inline private def sepPhone(b: Byte): Boolean =
    b == '-' || b == '.' || b == ' '
  @inline private def sepCard(b: Byte): Boolean = b == '-' || b == ' '
  /** email local part: [A-Za-z0-9._%+-] */
  @inline private def localCls(b: Byte): Boolean =
    letter(b) || digit(b) || b == '.' || b == '_' || b == '%' || b == '+' ||
      b == '-'
  /** email domain part: [A-Za-z0-9.-] */
  @inline private def domainCls(b: Byte): Boolean =
    letter(b) || digit(b) || b == '.' || b == '-'

  // ---- \b replay (java.util.regex default flags) --------------------------
  /** Is the CHARACTER containing byte i a \w word char to Java's default
    * Bound node? ASCII: [0-9A-Za-z_]. Non-ASCII: Java's Bound decodes the
    * FULL code point (Character.codePointBefore/codePointAt — surrogate
    * pairs included) and asks isLetterOrDigit, so a supplementary letter
    * (e.g. U+1D400 𝐀) IS a word char — the fuzz replay caught the
    * per-code-unit reading of this as a divergence. Stray / malformed
    * sequences decode to U+FFFD on the String path — non-word.
    */
  private def isWordCharAt(b: Array[Byte], i: Int): Boolean = {
    val x = b(i) & 0xff
    if (x < 0x80)
      (x >= '0' && x <= '9') || (x >= 'A' && x <= 'Z') ||
        (x >= 'a' && x <= 'z') || x == '_'
    else {
      var j = i
      while (j > 0 && (b(j) & 0xc0) == 0x80) j -= 1
      isWordLead(b, j)
    }
  }

  private def isWordLead(b: Array[Byte], j: Int): Boolean = {
    val n = b.length
    val x = b(j) & 0xff
    if (x < 0x80)
      (x >= '0' && x <= '9') || (x >= 'A' && x <= 'Z') ||
        (x >= 'a' && x <= 'z') || x == '_'
    else if (x < 0xc2 || x > 0xf4) false // stray continuation / invalid lead
    else if (x < 0xe0) { // 2-byte BMP
      if (j + 1 >= n || (b(j + 1) & 0xc0) != 0x80) false
      else Character.isLetterOrDigit(((x & 0x1f) << 6) | (b(j + 1) & 0x3f))
    } else if (x < 0xf0) { // 3-byte BMP
      // overlong (E0 80-9F) and CESU surrogates (ED A0-BF) decode to
      // U+FFFD (non-word) on Java's String path — reject, don't classify
      if (j + 2 >= n || (b(j + 1) & 0xc0) != 0x80 || (b(j + 2) & 0xc0) != 0x80)
        false
      else if (x == 0xe0 && (b(j + 1) & 0xff) < 0xa0) false
      else if (x == 0xed && (b(j + 1) & 0xff) >= 0xa0) false
      else
        Character.isLetterOrDigit(
          ((x & 0x0f) << 12) | ((b(j + 1) & 0x3f) << 6) | (b(j + 2) & 0x3f))
    } else { // 4-byte supplementary: Bound decodes the full code point
      // reject overlong (F0 80-8F → cp < 0x10000) and beyond-Unicode
      // (F4 90+ → cp > 0x10FFFF): String decodes both to U+FFFD
      if (j + 3 >= n || (b(j + 1) & 0xc0) != 0x80 ||
        (b(j + 2) & 0xc0) != 0x80 || (b(j + 3) & 0xc0) != 0x80) false
      else if (x == 0xf0 && (b(j + 1) & 0xff) < 0x90) false
      else if (x == 0xf4 && (b(j + 1) & 0xff) >= 0x90) false
      else
        Character.isLetterOrDigit(
          ((x & 0x07) << 18) | ((b(j + 1) & 0x3f) << 12) |
            ((b(j + 2) & 0x3f) << 6) | (b(j + 3) & 0x3f))
    }
  }

  @inline private def bndBefore(b: Array[Byte], i: Int): Boolean =
    i == 0 || !isWordCharAt(b, i - 1)
  @inline private def nonWordAfter(b: Array[Byte], p: Int): Boolean =
    p >= b.length || !isWordCharAt(b, p)

  @inline private def digitRunEnd(b: Array[Byte], i: Int): Int = {
    var j = i; val n = b.length
    while (j < n && digit(b(j))) j += 1
    j
  }
  @inline private def hexRunEnd(b: Array[Byte], i: Int): Int = {
    var j = i; val n = b.length
    while (j < n && hexc(b(j))) j += 1
    j
  }

  // ---- per-pattern matchers (candidate start -> match end, or -1) ---------

  /** \b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b — exact counts leave no
    * backtracking: each group must be the whole digit run (a longer run
    * puts a digit where the separator / trailing \b must sit).
    */
  private def nanpMatchAt(b: Array[Byte], i: Int): Int = {
    if (i + 12 > b.length) return -1
    if (digit(b(i)) && digit(b(i + 1)) && digit(b(i + 2)) &&
      sepPhone(b(i + 3)) &&
      digit(b(i + 4)) && digit(b(i + 5)) && digit(b(i + 6)) &&
      sepPhone(b(i + 7)) &&
      digit(b(i + 8)) && digit(b(i + 9)) && digit(b(i + 10)) &&
      digit(b(i + 11)) && nonWordAfter(b, i + 12)) i + 12
    else -1
  }

  /** \b(?:[0-9]{13,19}|[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{2,4})\b
    * Alt 1 first (leftmost-first alternation): a 13-19 digit run can only
    * end at its run end ({19}..{13} backtracking lands on digits — word
    * chars — for any shorter take). Alt 2's exact {4} groups must each be
    * a whole run followed by the separator; the final {2,4} group
    * likewise can only pass \b by consuming its whole run.
    */
  private def cardMatchAt(b: Array[Byte], i: Int): Int = {
    val n = b.length
    val e0 = digitRunEnd(b, i)
    val len0 = e0 - i
    if (len0 >= 13 && len0 <= 19 && nonWordAfter(b, e0)) return e0
    if (len0 == 4 && i + 4 < n && sepCard(b(i + 4)) &&
      i + 9 < n && digit(b(i + 5)) && digit(b(i + 6)) && digit(b(i + 7)) &&
      digit(b(i + 8)) && sepCard(b(i + 9)) &&
      i + 14 < n && digit(b(i + 10)) && digit(b(i + 11)) &&
      digit(b(i + 12)) && digit(b(i + 13)) && sepCard(b(i + 14))) {
      val f = digitRunEnd(b, i + 15) - (i + 15)
      if (f >= 2 && f <= 4 && nonWordAfter(b, i + 15 + f)) return i + 15 + f
    }
    -1
  }

  /** One octet (?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9]) consuming
    * the WHOLE run [s,e): the alternation's preference order over a
    * fixed run collapses to this shape test — any partial take leaves a
    * digit where the following literal '.' or trailing \b must sit.
    */
  private def fullOctet(b: Array[Byte], s: Int, e: Int): Boolean = {
    val len = e - s
    if (len == 1) true
    else if (len == 2) b(s) >= '1' && b(s) <= '9'
    else if (len == 3) {
      if (b(s) == '1') true
      else if (b(s) == '2') {
        if (b(s + 1) >= '0' && b(s + 1) <= '4') true
        else b(s + 1) == '5' && b(s + 2) >= '0' && b(s + 2) <= '5'
      } else false
    } else false
  }

  /** \b(?:oct\.){3}oct\b — three whole-run octets each followed by a
    * literal dot, then a whole-run octet with a trailing boundary.
    */
  private def ipv4MatchAt(b: Array[Byte], i: Int): Int = {
    val n = b.length
    var p = i
    var g = 0
    while (g < 3) {
      val e = digitRunEnd(b, p)
      if (e == p || !fullOctet(b, p, e) || e >= n || b(e) != '.') return -1
      p = e + 1
      if (p >= n || !digit(b(p))) return -1
      g += 1
    }
    val e = digitRunEnd(b, p)
    if (fullOctet(b, p, e) && nonWordAfter(b, e)) e else -1
  }

  /** Full-form \b(?:h{1,4}:){7}h{1,4}\b, else the ::-compressed
    * \b(?:h{1,4}:){1,6}:(?:h{1,4}:){0,5}h{1,4}\b with Java's greedy
    * backtracking replayed: a "h:" unit is always a whole hex run of
    * 1-4 followed by ':' (longer runs fail every quantifier take), the
    * unit counts k and m back off from their greedy maxima, and the
    * final group consumes a whole 1-4 run with a non-word follower.
    */
  private def ipv6MatchAt(b: Array[Byte], i: Int): Int = {
    val n = b.length
    // alt 1: exactly 7 "h:" units then a final group
    var p = i
    var j = 0
    var ok = true
    while (j < 7 && ok) {
      val e = hexRunEnd(b, p)
      val l = e - p
      if (l >= 1 && l <= 4 && e < n && b(e) == ':') p = e + 1 else ok = false
      j += 1
    }
    if (ok) {
      val e = hexRunEnd(b, p)
      val l = e - p
      if (l >= 1 && l <= 4 && nonWordAfter(b, e)) return e
    }
    // alt 2: k units (greedy, 6..1), literal ':', m units (greedy, 5..0),
    // final group
    val after = new Array[Int](7)
    after(0) = i
    var u = 0
    var cont = true
    while (u < 6 && cont) {
      val s = after(u)
      val e = hexRunEnd(b, s)
      val l = e - s
      if (l >= 1 && l <= 4 && e < n && b(e) == ':') { after(u + 1) = e + 1; u += 1 }
      else cont = false
    }
    var k = u
    while (k >= 1) {
      val pk = after(k)
      if (pk < n && b(pk) == ':') {
        val q = pk + 1
        val a2 = new Array[Int](6)
        a2(0) = q
        var m = 0
        var c2 = true
        while (m < 5 && c2) {
          val s = a2(m)
          val e = hexRunEnd(b, s)
          val l = e - s
          if (l >= 1 && l <= 4 && e < n && b(e) == ':') { a2(m + 1) = e + 1; m += 1 }
          else c2 = false
        }
        var mm = m
        while (mm >= 0) {
          val s = a2(mm)
          val e = hexRunEnd(b, s)
          val l = e - s
          if (l >= 1 && l <= 4 && nonWordAfter(b, e)) return e
          mm -= 1
        }
      }
      k -= 1
    }
    -1
  }

  /** \+[0-9]{1,3}[-. ]?[0-9]{2,4}(?:[-. ]?[0-9]{2,4}){1,3}\b — a real
    * (bounded, ~hundreds of states worst case) backtracker in the
    * pattern's exact preference order: country code 3..1, optional
    * separator consumed-first, each digit group 4..2, more units before
    * fewer, termination only past the 1-unit minimum and a \b.
    */
  private def intlMatchAt(b: Array[Byte], i: Int): Int = {
    val p0 = i + 1
    val aMax = math.min(3, digitRunEnd(b, p0) - p0)
    var a = aMax
    while (a >= 1) {
      val p1 = p0 + a
      var s1 = if (p1 < b.length && sepPhone(b(p1))) 1 else 0
      while (s1 >= 0) {
        val p2 = p1 + s1
        var bb = math.min(4, digitRunEnd(b, p2) - p2)
        while (bb >= 2) {
          val r = intlUnits(b, p2 + bb, 0)
          if (r >= 0) return r
          bb -= 1
        }
        s1 -= 1
      }
      a -= 1
    }
    -1
  }

  private def intlUnits(b: Array[Byte], p: Int, done: Int): Int = {
    if (done < 3) {
      var s = if (p < b.length && sepPhone(b(p))) 1 else 0
      while (s >= 0) {
        val q = p + s
        var c = math.min(4, digitRunEnd(b, q) - q)
        while (c >= 2) {
          val r = intlUnits(b, q + c, done + 1)
          if (r >= 0) return r
          c -= 1
        }
        s -= 1
      }
    }
    if (done >= 1 && nonWordAfter(b, p)) p else -1
  }

  // ---- scanners (find-all with non-overlap resume) -------------------------

  private final val K_NANP = 0
  private final val K_CARD = 1
  private final val K_IPV4 = 2
  private final val K_IPV6 = 3

  /** All matches of a \b-anchored digit/hex pattern, as (start,end) pairs.
    * Candidates are run starts (no position inside a digit/hex run has a
    * word boundary before it), resuming at each match end exactly as
    * Matcher.find does.
    */
  private def findAnchored(
      b: Array[Byte], kind: Int): java.util.ArrayList[Integer] = {
    val n = b.length
    val acc = new java.util.ArrayList[Integer](4)
    val hexKind = kind == K_IPV6
    var i = 0
    while (i < n) {
      val c = b(i)
      if ((if (hexKind) hexc(c) else digit(c)) && bndBefore(b, i)) {
        val end = kind match {
          case K_NANP => nanpMatchAt(b, i)
          case K_CARD => cardMatchAt(b, i)
          case K_IPV4 => ipv4MatchAt(b, i)
          case _      => ipv6MatchAt(b, i)
        }
        if (end >= 0) { acc.add(i); acc.add(end); i = end }
        else i = if (hexKind) hexRunEnd(b, i) else digitRunEnd(b, i)
      } else i += 1
    }
    acc
  }

  /** All email matches. A match is anchored on its '@': the local part is
    * the maximal local-class run ending at the '@' (leftmost start; may
    * not reach back past the scan position), the domain backtracks to the
    * LAST dot inside the maximal domain-class run that is followed by >=2
    * letters, and the TLD take is greedy.
    */
  private def findEmails(b: Array[Byte]): java.util.ArrayList[Integer] = {
    val n = b.length
    val acc = new java.util.ArrayList[Integer](4)
    var i = 0
    while (i < n) {
      // next '@' with a non-empty local part reaching no further back than i
      var a = i
      while (a < n && b(a) != '@') a += 1
      if (a >= n) return acc
      var ls = a
      while (ls > i && localCls(b(ls - 1))) ls -= 1
      if (ls == a) i = a + 1
      else {
        var e = a + 1
        while (e < n && domainCls(b(e))) e += 1
        var k = e - 1
        var end = -1
        while (k >= a + 2 && end < 0) {
          if (b(k) == '.') {
            var m = k + 1
            while (m < n && letter(b(m))) m += 1
            if (m - (k + 1) >= 2) end = m
          }
          k -= 1
        }
        if (end >= 0) { acc.add(ls); acc.add(end); i = end }
        else i = a + 1
      }
    }
    acc
  }

  private def findIntl(b: Array[Byte]): java.util.ArrayList[Integer] = {
    val n = b.length
    val acc = new java.util.ArrayList[Integer](4)
    var i = 0
    while (i < n) {
      if (b(i) == '+') {
        val end = intlMatchAt(b, i)
        if (end >= 0) { acc.add(i); acc.add(end); i = end } else i += 1
      } else i += 1
    }
    acc
  }

  /** Luhn check-digit fold over the match's digits (separators skipped),
    * reversed 1-based indexing — the exact HOF replay of
    * PiiScrub.luhnCardCountRaw.
    */
  private def luhnOk(b: Array[Byte], s: Int, e: Int): Boolean = {
    var idx = 0
    var sum = 0
    var j = e - 1
    while (j >= s) {
      val c = b(j)
      if (digit(c)) {
        idx += 1
        val d = c - '0'
        sum += (if (idx % 2 == 1) d else 2 * d - (if (d > 4) 9 else 0))
      }
      j -= 1
    }
    sum % 10 == 0
  }

  /** replaceAll: splice the placeholder over each match span. Scans (and
    * boundary-checks) only the ORIGINAL input of this pass, exactly as
    * Matcher.replaceAll does.
    */
  private def replaced(
      b: Array[Byte],
      ms: java.util.ArrayList[Integer],
      ph: Array[Byte]): Array[Byte] = {
    if (ms.isEmpty) return b
    val pairs = ms.size / 2
    var outLen = b.length + pairs * ph.length
    var t = 0
    while (t < pairs) {
      outLen -= ms.get(2 * t + 1) - ms.get(2 * t)
      t += 1
    }
    val out = new Array[Byte](outLen)
    var src = 0
    var dst = 0
    t = 0
    while (t < pairs) {
      val s = ms.get(2 * t)
      val e = ms.get(2 * t + 1)
      System.arraycopy(b, src, out, dst, s - src)
      dst += s - src
      System.arraycopy(ph, 0, out, dst, ph.length)
      dst += ph.length
      src = e
      t += 1
    }
    System.arraycopy(b, src, out, dst, b.length - src)
    out
  }

  private val PH_EMAIL = "[EMAIL]".getBytes
  private val PH_PHONE = "[PHONE]".getBytes
  private val PH_CARD = "[CARD]".getBytes
  private val PH_IP = "[IP]".getBytes
  private val PH_IPV6 = "[IPV6]".getBytes

  /** The full D34 scan: detection counts on the raw text (emails, phones
    * = NANP + intl, ips = v4 + v6, cards Luhn-gated) and the six-step
    * redaction chain, with the per-class needle guards computed in one
    * presence pass ('@' email, '+' intl, ':' v6, any digit for the rest —
    * a class whose needle is absent from the RAW text can match at no
    * step of the chain: no placeholder reintroduces a needle an earlier
    * step consumed). Returns (emails, phones, ips, cards, red).
    */
  def piiScan(text: UTF8String): InternalRow = {
    val raw = text.getBytes
    val n = raw.length
    var hasAt = false
    var hasPlus = false
    var hasColon = false
    var hasDigit = false
    var i = 0
    while (i < n) {
      val c = raw(i)
      if (c == '@') hasAt = true
      else if (c == '+') hasPlus = true
      else if (c == ':') hasColon = true
      else if (c >= '0' && c <= '9') hasDigit = true
      i += 1
    }
    var emails = 0
    var phones = 0
    var ips = 0
    var cards = 0
    var cur = raw
    if (hasAt) {
      val ms = findEmails(raw)
      emails = ms.size / 2
      cur = replaced(cur, ms, PH_EMAIL)
    }
    if (hasPlus) {
      val ms = findIntl(raw)
      phones += ms.size / 2
      cur = replaced(cur, if (cur eq raw) ms else findIntl(cur), PH_PHONE)
    }
    if (hasDigit) {
      val mCard = findAnchored(raw, K_CARD)
      var t = 0
      while (t < mCard.size / 2) {
        if (luhnOk(raw, mCard.get(2 * t), mCard.get(2 * t + 1))) cards += 1
        t += 1
      }
      cur = replaced(cur, if (cur eq raw) mCard else findAnchored(cur, K_CARD),
        PH_CARD)
      val mNanp = findAnchored(raw, K_NANP)
      phones += mNanp.size / 2
      cur = replaced(cur, if (cur eq raw) mNanp else findAnchored(cur, K_NANP),
        PH_PHONE)
      val mIp4 = findAnchored(raw, K_IPV4)
      ips += mIp4.size / 2
      cur = replaced(cur, if (cur eq raw) mIp4 else findAnchored(cur, K_IPV4),
        PH_IP)
    }
    if (hasColon) {
      val mIp6 = findAnchored(raw, K_IPV6)
      ips += mIp6.size / 2
      cur = replaced(cur, if (cur eq raw) mIp6 else findAnchored(cur, K_IPV6),
        PH_IPV6)
    }
    val red = if (cur eq raw) text else UTF8String.fromBytes(cur)
    new GenericInternalRow(Array[Any](emails, phones, ips, cards, red))
  }
}
