package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LmScore

/** Pins the D31 bigram-LM contract (operators/LmScore.scala) on a
  * hand-computed corpus: extraction edge cases (0/1-token docs produce
  * no bigrams and drop out), occurrence multiplicity (a repeated bigram
  * counts every occurrence, unlike the deduping shingle kernel), the
  * add-one smoothing denominator (c1 + V with c1 = w1's LEFT-side
  * occurrence count and V = distinct predicted-side words), and the
  * quantized floor(−10⁶·ln p) per-occurrence contribution.
  */
class LmScoreSpec extends AnyFunSuite {
  import SparkFixture._

  // Corpus: doc1 "a b a b" → bigrams (a,b),(b,a),(a,b); doc2 "b c" →
  // (b,c); doc3 one token, doc4 empty → no bigrams.
  // c12: (a,b)=2 (b,a)=1 (b,c)=1; c1: a=2 b=2; V = |{b,a,c}| = 3.
  // q(a,b) = floor(−1e6·ln((2+1)/(2+3))) = floor(510825.623…) = 510825
  // q(b,a) = q(b,c) = floor(−1e6·ln((1+1)/(2+3))) = floor(916290.731…)
  //        = 916290
  private lazy val out = {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"), (2L, "b c"), (3L, "x"), (4L, "")
    ).toDF("doc_id", "text")
    LmScore.bigramNll(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("0- and 1-token docs yield no bigrams and are absent") {
    assert(out.keySet == Set(1L, 2L))
  }

  test("multiplicity: repeated bigram contributes per occurrence") {
    val r = out(1L)
    assert(r.getLong(1) == 3L, "doc1 has 3 bigram occurrences")
    assert(r.getLong(2) == 2L * 510825L + 916290L) // 1937940
  }

  test("smoothing denominator is c1 + V over predicted-side vocab") {
    val r = out(2L)
    assert(r.getLong(1) == 1L)
    assert(r.getLong(2) == 916290L)
    assert(math.abs(r.getDouble(3) - 0.916290) < 1e-12)
  }

  test("avg_nll is nll_scaled / (1e6 * n_bigrams)") {
    val r = out(1L)
    assert(math.abs(r.getDouble(3) - 1937940.0 / 3e6) < 1e-12)
  }
}
