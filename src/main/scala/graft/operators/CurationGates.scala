package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The scan-local per-document curation gates shared by the batch
  * report (D36/q93) and its streaming face (C20) — ONE definition, so
  * stream == batch is structural: both read exactly these columns.
  *
  * Every gate here is a pure projection (zero joins, zero aggregation
  * state): PII via the one-call PiiScanE kernel (D34), language-ID via
  * the q37 stopword-hit argmax with its fixed tie-break order, quality
  * via the q38 keep-rule. The corpus-relative gates (exact-dup,
  * near-dup, contamination) are NOT here by design — their batch and
  * ingest-edge forms differ (a batch scans its whole corpus; the edge
  * probes a maintained index), and each face composes them from its own
  * operators (q93: in-corpus groups/pairs; C20: C14's seen-hash index,
  * a broadcast benchmark-gram probe).
  */
object CurationGates {

  /** D8's stopword table — token-exact hits, argmax with a fixed
    * tie-break order (en > de > es > fr > und), mirrored verbatim in
    * the q37/q93 oracles.
    */
  val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "und", "ist"),
    "es" -> Seq("el", "la", "que", "por"),
    "fr" -> Seq("le", "les", "et", "dans"))

  /** The q37 argmax over stopword hits. */
  def predictedLang(text: Column): Column = {
    val toks = split(text, " ")
    val hits = langStops.map { case (lang, stops) =>
      lang -> size(filter(toks, t => stops.map(t === _).reduce(_ || _)))
    }
    val Seq(en, de, es, fr) = hits.map(_._2)
    when(en >= de && en >= es && en >= fr && en > 0, "en")
      .when(de >= es && de >= fr && de > 0, "de")
      .when(es >= fr && es > 0, "es")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** langid gate: predicted language disagrees with the recorded one. */
  def langFlag(text: Column, lang: Column): Column =
    predictedLang(text) =!= lang

  /** quality gate: the q38 keep-rule, negated (≥50 tokens AND ≥0.3
    * distinct-token ratio keeps; everything else flags).
    */
  def qualFlag(text: Column): Column = {
    val toks = split(text, " ")
    !(size(toks) >= 50 &&
      (size(array_distinct(toks)) / size(toks)) >= 0.3)
  }

  /** pii gate: any D34 detection class fires (all four counts read one
    * PiiScanE kernel evaluation — identical subtrees collapse under
    * subexpression elimination).
    */
  def piiFlag(text: Column): Column = {
    val p = PiiScrub.piiScan(text)
    (p.getField("emails") + p.getField("phones") +
      p.getField("ips") + p.getField("cards")) > 0
  }
}
