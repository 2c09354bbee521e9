package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ChunkDedup, ExactSubstr}

/** ExactSubstr substring dedup (SURVEY.md §2.D38, Lee et al. 2022):
  * overlapping-window span semantics, interval merge, the dedup pass,
  * and the load-bearing contrast with D22's disjoint chunks.
  */
class ExactSubstrSpec extends AnyFunSuite {
  import SparkFixture._
  import spark.implicits._

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("a shared >=L substring yields one span with the EXACT token extent") {
    // docs 1 and 2 share a 20-token run at different offsets; L = 15
    val shared = words("s", 20)
    val d1 = (words("a", 7) ++ shared ++ words("b", 9)).mkString(" ")
    val d2 = (words("c", 3) ++ shared ++ words("d", 13)).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val sp = ExactSubstr.spans(docs, "doc_id", "text", minTokens = 15)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // windows inside the shared run: positions 7..12 in d1 (6 windows,
    // run [7, 27)), 3..8 in d2 — merged to exactly the shared extent
    assert(sp.toSeq == Seq((1L, 7L, 27L), (2L, 3L, 23L)),
      s"span extents must be exact, got ${sp.toSeq}")
    val st = ExactSubstr.stats(docs, "doc_id", "text", minTokens = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    // d1: 36 tokens -> 22 windows, 6 duplicated, 1 span of 20 tokens
    assert(st.head == (1L, 22L, 6L, 1L, 20L, 20L), s"got ${st.head}")
  }

  test("intra-document repetition counts (multiplicity, as a suffix array would)") {
    val run = words("r", 16)
    val doc = (run ++ words("x", 5) ++ run).mkString(" ")
    val docs = Seq((1L, doc)).toDF("doc_id", "text")
    val sp = ExactSubstr.spans(docs, "doc_id", "text", minTokens = 15)
      .collect().map(r => (r.getLong(2), r.getLong(3))).sorted
    // the two copies of the 16-token run are 21 positions apart (> L),
    // so they stay two distinct spans, each with the exact 16-token extent
    assert(sp.toSeq == Seq((0L, 16L), (21L, 37L)), s"got ${sp.toSeq}")
  }

  test("duplicated windows > L apart split into separate spans; <= L merge") {
    val s1 = words("p", 15); val s2 = words("q", 15)
    // d1 = s1 + 16 unique + s2 : gap between dup positions = 31 > 15
    val d1 = (s1 ++ words("u", 16) ++ s2).mkString(" ")
    val d2 = (s1 ++ words("v", 16) ++ s2).mkString(" ")
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val st = ExactSubstr.stats(docs, "doc_id", "text", minTokens = 15)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(st.forall(t => t._2 == 2L && t._3 == 30L),
      s"two 15-token spans per doc expected, got ${st.toSeq}")
    // bridge them: gap exactly L merges into one span
    val d3 = (s1 ++ words("w", 5) ++ s1).mkString(" ")   // dup at 0 and 20
    val d4 = (s1 ++ words("y", 5) ++ s1).mkString(" ")
    // NOTE positions: second s1 starts at 20, gap 20 > 15 -> split; use a
    // 0-gap overlap instead: s1 ++ s1 (second copy at 15, gap 15 <= 15)
    val d5 = (s1 ++ s1).mkString(" ")
    val d6 = (s1 ++ s1 ++ words("z", 3)).mkString(" ")
    val merged = ExactSubstr.stats(
      Seq((5L, d5), (6L, d6)).toDF("doc_id", "text"),
      "doc_id", "text", minTokens = 15)
      .filter($"id" === 5L).collect().head
    assert(merged.getLong(3) == 1L && merged.getLong(4) == 30L,
      s"adjacent coverage must merge to one 30-token span, got $merged")
    val split = ExactSubstr.stats(
      Seq((3L, d3), (4L, d4)).toDF("doc_id", "text"),
      "doc_id", "text", minTokens = 15)
      .filter($"id" === 3L).collect().head
    assert(split.getLong(3) == 2L,
      s"gap 20 > L must keep two spans, got $split")
  }

  test("overlap semantics vs D22 disjoint chunks: a straddling duplicate is invisible to chunks") {
    // a 16-token duplicate placed to straddle every 8-token chunk
    // boundary: chunk dedup (disjoint 8-token units) sees NO duplicated
    // chunk because the copies are phase-shifted by 4 tokens, while
    // overlapping windows recover the exact 16-token span in both docs
    val shared = words("s", 16)
    val d1 = (words("a", 4) ++ shared ++ words("b", 12)).mkString(" ") // 32 toks
    val d2 = (words("c", 8) ++ shared ++ words("d", 8)).mkString(" ")  // 32 toks
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val chunk = ChunkDedup.stats(docs, "doc_id", "text", chunkTokens = 8)
    assert(chunk.collect().forall(_.getAs[Long]("n_dup") == 0L),
      "phase-shifted copies must be invisible to disjoint chunks")
    val es = ExactSubstr.stats(docs, "doc_id", "text", minTokens = 15)
      .collect().map(r => (r.getLong(0), r.getLong(4))).sorted
    assert(es.toSeq == Seq((1L, 16L), (2L, 16L)),
      s"overlapping windows must recover the exact straddling span, got ${es.toSeq}")
  }

  test("clean() cuts exactly the duplicate spans; untouched docs pass through") {
    val shared = words("s", 15)
    val keep1 = words("a", 5); val keep2 = words("b", 6)
    val d1 = (keep1 ++ shared ++ keep2).mkString(" ")
    val d2 = (shared ++ words("c", 4)).mkString(" ")
    val d3 = words("u", 10).mkString(" ") // no duplicates, shorter than L
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val out = ExactSubstr.clean(docs, "doc_id", "text", minTokens = 15)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ((keep1 ++ keep2).mkString(" "), 11L))
    assert(out(2L) == (words("c", 4).mkString(" "), 4L))
    assert(out(3L) == (d3, 10L), "a doc without duplicate spans passes through")
  }

  test("docs shorter than L contribute no windows and never appear") {
    val docs = Seq((1L, words("a", 14).mkString(" ")),
      (2L, words("a", 14).mkString(" "))).toDF("doc_id", "text")
    // identical 14-token docs, but no 15-token window exists
    assert(ExactSubstr.stats(docs, "doc_id", "text", minTokens = 15).count() == 0)
  }
}
