package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{FuzzyDedup, Retrieval}

/** D27 BM25 retrieval + D28 blocked edit-distance dedup
  * (SURVEY.md §2) — the oracled q76/q77 cover engine-vs-DuckDB
  * equality; these specs pin the operator SEMANTICS against
  * hand-computable cases and the scale-shape invariants.
  */
class RetrievalSpec extends AnyFunSuite {
  import SparkFixture._
  import spark.implicits._

  // ---- D27 BM25 ---------------------------------------------------------

  test("D27 bm25: hand-checked scores on a 3-doc corpus") {
    // corpus: term 'a' everywhere (df=3), 'b' in two docs, 'c' in one
    val docs = Seq(
      (1L, "a b c"),
      (2L, "a b b b"),
      (3L, "a a a a a")).toDF("doc_id", "text")
    val qt = Seq((0, "c"), (1, "b")).toDF("q_id", "term")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", qt, k = 3)
      .orderBy("q_id", "rn")
      .select("q_id", "rn", "doc_id", "score_scaled")
      .as[(Int, Int, Long, Long)].collect()

    // reference BM25 (k1=1.2, b=0.75), quantized exactly as the operator:
    // per-term contribution floor(idf * w * 1e6), summed
    val n = 3L; val total = 12L // 3 + 4 + 5 tokens
    def contrib(tf: Long, dl: Long, df: Long): Long = {
      val idf = math.log((2.0 * n + 2) / (2.0 * df + 1))
      val w = (44.0 * total * tf) / (20.0 * total * tf + 6 * total + 18.0 * dl * n)
      math.floor(idf * w * 1e6).toLong
    }
    // q0 = 'c': only doc 1 matches
    assert(got.filter(_._1 == 0).toSeq == Seq((0, 1, 1L, contrib(1, 3, 1))))
    // q1 = 'b': docs 1 (tf=1, dl=3) and 2 (tf=3, dl=4); doc 2 saturates higher
    val q1 = got.filter(_._1 == 1).toSeq
    assert(q1 == Seq(
      (1, 1, 2L, contrib(3, 4, 2)),
      (1, 2, 1L, contrib(1, 3, 2))))
    assert(contrib(3, 4, 2) > contrib(1, 3, 2), "tf saturation must rank doc 2 first")
  }

  test("D27 bm25: k bounds output and ranking is (score desc, doc_id asc)") {
    val docs = Tables.t(spark, sfDir, "documents")
    val qt = Seq((7, "spark"), (7, "join")).toDF("q_id", "term")
    val top = Retrieval.bm25TopK(docs, "doc_id", "text", qt, k = 5,
      stage = true).collect()
    assert(top.length == 5)
    val scores = top.sortBy(_.getAs[Int]("rn"))
      .map(r => (r.getAs[Long]("score_scaled"), r.getAs[Long]("doc_id")))
    assert(scores.sliding(2).forall { case Array((s1, d1), (s2, d2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2) },
      s"rank order must be (score desc, doc_id asc): ${scores.toSeq}")
  }

  test("D27 bm25: corpus is tokenized exactly once when staged") {
    val docs = Tables.t(spark, sfDir, "documents")
    val qt = Seq((0, "spark")).toDF("q_id", "term")
    val plan = Retrieval.bm25TopK(docs, "doc_id", "text", qt, k = 3,
      stage = true).queryExecution.executedPlan.toString
    // the staged tf checkpoint leaves at most the checkpoint scan; no
    // parquet re-scan of documents may remain in the final plan
    assert(!plan.contains("documents.parquet"),
      s"staged bm25 must not rescan the corpus:\n$plan")
  }

  // ---- D28 fuzzy dedup --------------------------------------------------

  test("D28 editPairs: finds planted near-identical pair, skips distant ones") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta thetX"), // 1 char swap
      (3L, "alpha beta completely different text here now entirely"),
      (4L, "omega psi chi phi upsilon tau sigma rho")).toDF("doc_id", "text")
    val pairs = FuzzyDedup.editPairs(docs, "doc_id", "text", maxRel = 0.1)
      .select("doc_a", "doc_b", "edit_dist").as[(Long, Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 1L)),
      s"only the planted 1-edit pair qualifies: ${pairs.toSeq}")
  }

  test("D28 editPairs: suffix block catches a pair whose prefix was edited") {
    val docs = Seq(
      (1L, "zzzz beta gamma delta epsilon zeta eta theta"),
      (2L, "yyyy beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    // prefix2 differs (first token edited) but suffix2 + length bucket agree
    val pairs = FuzzyDedup.editPairs(docs, "doc_id", "text", maxRel = 0.2)
      .collect()
    assert(pairs.length == 1 && pairs(0).getAs[Long]("edit_dist") == 4L)
  }

  test("D28 editPairs: each pair reported once even when both blocks match") {
    val docs = Seq(
      (1L, "same first words middle differs same last words"),
      (2L, "same first words muddle differs same last words")).toDF("doc_id", "text")
    val pairs = FuzzyDedup.editPairs(docs, "doc_id", "text", maxRel = 0.2).collect()
    assert(pairs.length == 1, s"pre2 AND suf2 both match; pair must dedup")
  }

  test("D28 editPairs: levenshtein matches a reference implementation") {
    // classic DP reference on a few real corpus candidate pairs
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val docs = Tables.t(spark, sfDir, "documents")
    val got = FuzzyDedup.editPairs(docs, "doc_id", "text", maxRel = 0.5)
      .limit(5).collect()
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    got.foreach { r =>
      val (a, b) = (texts(r.getAs[Long]("doc_a")), texts(r.getAs[Long]("doc_b")))
      assert(r.getAs[Long]("edit_dist") == lev(a, b).toLong)
    }
  }
}
