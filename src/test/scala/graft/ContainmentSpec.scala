package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Containment, Dedup}

/** D30 shingle-containment dedup (SURVEY.md §2) — q83 gates the sketch
  * machinery against DuckDB on the corpus; these pin the ASYMMETRIC
  * semantics the synthetic corpus cannot exercise (its ≥0.8-containment
  * pairs all have |S(A)|/|S(B)| ≥ 0.875): a short doc quoted inside a
  * much longer one must surface here and must NOT surface in the
  * jaccard family.
  */
class ContainmentSpec extends AnyFunSuite {
  import SparkFixture._
  import spark.implicits._

  // a 40-token "quote" embedded verbatim inside a ~200-token host doc,
  // plus unrelated filler docs
  private val quote = (1 to 40).map(i => s"tok$i").mkString(" ")
  private val host = ((1 to 80).map(i => s"pre$i") ++ (1 to 40).map(i => s"tok$i")
    ++ (1 to 80).map(i => s"post$i")).mkString(" ")
  private val filler = (1 to 3).map(d =>
    (100L + d, (1 to 60).map(i => s"f${d}x$i").mkString(" ")))
  private def corpus = (Seq((1L, quote), (2L, host)) ++ filler)
    .toDF("doc_id", "text")

  test("D30 a quoted doc is found contained in its host at containment 1.0") {
    val pairs = Containment.containmentPairs(corpus, "doc_id", "text")
      .collect()
    assert(pairs.length == 1)
    val r = pairs(0)
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Double]("containment") == 1.0,
      "every shingle of the quote appears in the host")
  }

  test("D30 the same pair is INVISIBLE to symmetric jaccard at its threshold") {
    // jaccard(quote, host) = |A|/|B| = 36/196 ≈ 0.18 — below any useful
    // near-dup threshold; this asymmetry is the reason the operator exists
    val j = Dedup.minhashPairs(corpus, "doc_id", "text",
      shingleK = 5, threshold = 0.5)
    assert(j.count() == 0)
  }

  test("D30 ubiquitous shingles are df-capped out of candidate generation") {
    // 40 docs all sharing one boilerplate sentence (df = 40 > cap) plus
    // disjoint bodies: the boilerplate alone must not produce candidates
    val docs = (1 to 40).map { d =>
      (d.toLong, ("common boiler plate sentence here always the same " +
        (1 to 30).map(i => s"d${d}w$i").mkString(" ")))
    }.toDF("doc_id", "text")
    val pairs = Containment.containmentPairs(docs, "doc_id", "text")
    assert(pairs.count() == 0,
      "shared boilerplate below the df cap must not make every pair a candidate")
  }
}
