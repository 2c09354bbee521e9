package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.NbQuality

/** Pins the D32 NB-classifier contract (operators/NbQuality.scala)
  * against an independent plain-Scala re-implementation of the exact
  * quantized formula on a hand corpus — every BIGINT must match, which
  * transitively pins the add-one smoothing, the absent-row = ln(1) = 0
  * convention (no outer join needed), multiplicity, and the prior
  * terms. Plus the separation sanity a classifier must show when the
  * classes use disjoint vocabulary.
  */
class NbQualitySpec extends AnyFunSuite {
  import SparkFixture._

  // pos docs: 60 distinct words (n>=50, uniq 100%); neg docs: short or
  // all-repeat. Vocabularies overlap on "shared" so the model table has
  // mixed rows as well as single-class rows.
  private val posText1 = (0 until 60).map(i => s"w$i").mkString(" ")
  private val posText2 = ((0 until 55).map(i => s"v$i") :+ "shared").mkString(" ")
  private val negText1 = "shared x x shared"
  private val negText2 = (0 until 60).map(_ => "y").mkString(" ")

  private lazy val out = {
    import spark.implicits._
    val docs = Seq(
      (1L, posText1), (2L, posText2), (3L, negText1), (4L, negText2)
    ).toDF("doc_id", "text")
    NbQuality.nbLogOdds(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  // independent reference: same formula, plain collections
  private lazy val expected: Map[Long, (Long, Boolean, Long)] = {
    val docs = Map(1L -> posText1, 2L -> posText2,
      3L -> negText1, 4L -> negText2)
    def toks(t: String) = t.split(" ", -1).toSeq
    def isPos(t: String) = {
      val tk = toks(t)
      tk.size >= 50 && tk.distinct.size * 10 >= tk.size * 3
    }
    val q = (x: Long) => math.floor(1e6 * math.log(x.toDouble)).toLong
    val tfs = docs.map { case (id, t) =>
      id -> toks(t).groupBy(identity).view.mapValues(_.size.toLong).toMap }
    val vocab = tfs.values.flatMap(_.keys).toSet
    def classCount(tok: String, pos: Boolean) =
      tfs.collect { case (id, tf) if isPos(docs(id)) == pos =>
        tf.getOrElse(tok, 0L) }.sum
    val (totp, totn) = (vocab.toSeq.map(classCount(_, true)).sum,
      vocab.toSeq.map(classCount(_, false)).sum)
    val v = vocab.size.toLong
    val ndp = docs.values.count(isPos).toLong
    val ndn = docs.size - ndp
    val (q2p, q2n) = (q(totp + v), q(totn + v))
    val (q3p, q3n) = (q(ndp + 1), q(ndn + 1))
    docs.map { case (id, t) =>
      val tf = tfs(id)
      val n = tf.values.sum
      val s1 = tf.map { case (tok, m) =>
        m * (q(classCount(tok, true) + 1) - q(classCount(tok, false) + 1))
      }.sum
      val lo = s1 - n * (q2p - q2n) + (q3p - q3n)
      id -> ((n, isPos(t), lo))
    }
  }

  test("log-odds matches the independent exact-BIGINT reference per doc") {
    assert(out.keySet == expected.keySet)
    for ((id, (n, pos, lo)) <- expected) {
      val r = out(id)
      assert(r.getLong(1) == n, s"doc $id n_toks")
      assert(r.getBoolean(2) == pos, s"doc $id label")
      assert(r.getLong(3) == lo, s"doc $id logodds: got ${r.getLong(3)} want $lo")
      assert(r.getBoolean(4) == (lo > 0L), s"doc $id predicted")
    }
  }

  test("disjoint-vocabulary classes separate: labels recovered") {
    for ((id, (_, pos, _)) <- expected)
      assert(out(id).getBoolean(4) == pos,
        s"doc $id should classify as its own label on this corpus")
  }
}
