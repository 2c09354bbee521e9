package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.BpeTokens

/** D33 learned-BPE tokenizer (SURVEY.md §2) — q88 gates engine-vs-
  * DuckDB equality of the WHOLE train+apply pipeline; these pin the
  * operator against an independent plain-Scala reference tokenizer
  * (index-scan application + sliding-window pair counts, deliberately
  * NOT the operator's foldLeft/aggregate-HOF formulation).
  */
class BpeSpec extends AnyFunSuite {
  import SparkFixture._

  // independent reference: apply one merge by repeated index scan
  private def refApply(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  // independent reference trainer: sliding(2) pair counts
  private def refTrain(wc: Seq[(String, Long)], rounds: Int): Seq[(String, String)] = {
    var seqs = wc.map { case (w, c) => (w.map(_.toString).toList, c) }
    val out = Seq.newBuilder[(String, String)]
    var r = 0
    var stop = false
    while (r < rounds && !stop) {
      val pc = seqs.flatMap { case (s, c) =>
        if (s.length < 2) Nil else s.sliding(2).map(p => ((p(0), p(1)), c)).toList
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pc.isEmpty) stop = true
      else {
        val best = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        seqs = seqs.map { case (s, c) => (refApply(s, best._1, best._2), c) }
      }
      r += 1
    }
    out.result()
  }

  test("D33 greedy overlap semantics: aaaa -> [aa,aa], aaa -> [aa,a]") {
    assert(BpeTokens.applyMerge(Vector("a", "a", "a", "a"), "a", "a")
      == Vector("aa", "aa"))
    assert(BpeTokens.applyMerge(Vector("a", "a", "a"), "a", "a")
      == Vector("aa", "a"))
    // merged symbol does not re-merge with a following raw 'a'
    assert(BpeTokens.applyMerge(Vector("a", "aa", "aa"), "a", "aa")
      == Vector("aaa", "aa"))
  }

  test("D33 trainer == independent reference on a crafted corpus") {
    val wc = Seq(("the", 100L), ("then", 40L), ("bath", 30L), ("xyz", 5L))
    val got = BpeTokens.train(wc, 6)
    val want = refTrain(wc, 6)
    assert(got == want)
    // 'th' is the most frequent pair (170) and must be the first merge
    assert(got.head == ("t", "h"))
  }

  test("D33 operator per-doc counts == reference tokenizer end-to-end") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(80).localCheckpoint()
    val got = BpeTokens.bpeTokenCounts(docs, "doc_id", "text",
        topW = 64, rounds = 12)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // reference: collect words, train on top-64, tokenize each doc
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val words = rows.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
    val wc = words.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(64)
    val merges = refTrain(wc, 12)
    def tok(w: String): Int =
      merges.foldLeft(w.map(_.toString).toList) {
        case (s, (a, b)) => refApply(s, a, b)
      }.length
    val tokCache = scala.collection.mutable.Map.empty[String, Int]
    rows.foreach { case (id, text) =>
      val ws = text.split(" ", -1).filter(_.nonEmpty)
      val want = (ws.length.toLong,
        ws.map(w => tokCache.getOrElseUpdate(w, tok(w)).toLong).sum)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
  }
}
