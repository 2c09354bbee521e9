package graft.engine

/** Quote/paren-aware SQL text scanning shared by GraftSession and the
  * shell — a ';' or ',' or keyword inside a string literal is content,
  * not syntax. All scanners agree on the same rules: quotes are `'`,
  * `"`, `` ` ``; a backslash inside a `'`/`"` literal escapes the next
  * character (Spark/MySQL string semantics); identifier characters are
  * letters, digits and '_'.
  */
object SqlText {

  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Split on a separator, ignoring separators nested in parens/quotes. */
  def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0; var quote: Char = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        cur += c
        if (c == '\\' && quote != '`' && i + 1 < s.length) {
          cur += s.charAt(i + 1); i += 1
        } else if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`'  => quote = c; cur += c
        case '('               => depth += 1; cur += c
        case ')'               => depth -= 1; cur += c
        case x if x == sep && depth == 0 => out += cur.toString; cur.clear()
        case x                 => cur += x
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  /** First top-level occurrence of a standalone keyword (case-insensitive,
    * outside quotes/parens, '_' counts as an identifier char); -1 if
    * absent.
    */
  def topLevelIndexOfWord(s: String, word: String): Int = {
    var quote: Char = 0; var depth = 0; var i = 0
    val n = s.length; val wl = word.length
    while (i < n) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == '\\' && quote != '`' && i + 1 < n) i += 1
        else if (c == quote) quote = 0
        i += 1
      } else c match {
        case '\'' | '"' | '`' => quote = c; i += 1
        case '('              => depth += 1; i += 1
        case ')'              => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && i + wl <= n &&
              s.regionMatches(true, i, word, 0, wl) &&
              (i == 0 || !isWordChar(s.charAt(i - 1))) &&
              (i + wl == n || !isWordChar(s.charAt(i + wl))))
            return i
          i += 1
      }
    }
    -1
  }

  /** Index just past the ')' matching the FIRST top-level '(' —
    * quote-aware, so a paren inside a string literal (a quoted DEFAULT,
    * a COMMENT) never closes the group. 0 when there is no top-level
    * '(' or it never closes.
    */
  def afterMatchingClose(s: String): Int = {
    var quote: Char = 0; var depth = 0; var opened = false; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == '\\' && quote != '`' && i + 1 < s.length) i += 1
        else if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`' => quote = c
        case '('              => depth += 1; opened = true
        case ')' =>
          depth -= 1
          if (opened && depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    0
  }

  /** True when the trimmed text ends with a ';' that is outside any
    * string literal (i.e. the statement is complete).
    */
  def endsStatement(s: String): Boolean = {
    val t = s.trim
    if (!t.endsWith(";")) return false
    var quote: Char = 0; var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (quote != 0) {
        if (c == '\\' && quote != '`' && i + 1 < t.length) i += 1
        else if (c == quote) quote = 0
      } else if (c == '\'' || c == '"' || c == '`') quote = c
      i += 1
    }
    quote == 0
  }

  /** Count '?' parameter markers outside string literals. */
  def countPlaceholders(s: String): Int = {
    var n = 0; var quote: Char = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == '\\' && quote != '`' && i + 1 < s.length) i += 1
        else if (c == quote) quote = 0
      } else if (c == '\'' || c == '"' || c == '`') quote = c
      else if (c == '?') n += 1
      i += 1
    }
    n
  }

  /** Replace '?' markers outside string literals with `args` in order. */
  def bindPlaceholders(s: String, args: Seq[String]): String = {
    val out = new StringBuilder
    var quote: Char = 0; var argIdx = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        out += c
        if (c == '\\' && quote != '`' && i + 1 < s.length) {
          out += s.charAt(i + 1); i += 1
        } else if (c == quote) quote = 0
      } else if (c == '\'' || c == '"' || c == '`') { quote = c; out += c }
      else if (c == '?') { out ++= args(argIdx); argIdx += 1 }
      else out += c
      i += 1
    }
    out.toString
  }
}
