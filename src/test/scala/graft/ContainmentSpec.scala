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

  test("D35 postingDelta applied to the old index == full rebuild, cap crossings retire buckets") {
    // dfCap = 2; the "crosser" phrase is shared by old docs 1,2 AND delta
    // doc 3 (df 2 -> 3: its bucket must RETIRE when the delta lands); the
    // "survivor" phrase is shared only by old doc 4 and delta doc 5
    // (df 1 -> 2: stays live, delta row inserted)
    val crosser = "alpha beta gamma delta epsilon"
    val survivor = "zeta eta theta iota kappa"
    def body(d: Int) = (1 to 20).map(i => s"d${d}w$i").mkString(" ")
    val old = Seq(
      (1L, s"$crosser ${body(1)}"), (2L, s"$crosser ${body(2)}"),
      (4L, s"$survivor ${body(4)}")).toDF("doc_id", "text")
    val delta = Seq(
      (3L, s"$crosser ${body(3)}"), (5L, s"$survivor ${body(5)}"))
      .toDF("doc_id", "text")
    val all = old.unionByName(delta)
    val cap = 2
    val oldDf = Containment.dfIndex(old, "doc_id", "text").localCheckpoint()
    val oldPost = Containment.postingIndex(old, "doc_id", "text", dfCap = cap)
      .localCheckpoint()
    val (dfUp, ins, del) = Containment.postingDelta(
      oldDf, oldPost, delta, "doc_id", "text", dfCap = cap)

    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    // the crossing actually fired: the crosser gram's old bucket rows
    // (docs 1 and 2) are retired
    assert(del.count() == 2, "df 2 -> 3 must retire the old bucket rows")
    // df table after upsert == full recount
    val newDf = oldDf.join(dfUp, Seq("h"), "left_anti").unionByName(dfUp)
    assert(rows(newDf) == rows(Containment.dfIndex(all, "doc_id", "text")))
    // posting table after (delete, insert) == full rebuild at the same cap
    val newPost = oldPost.join(del, Seq("h", "doc_b"), "left_anti")
      .unionByName(ins)
    assert(rows(newPost) ==
      rows(Containment.postingIndex(all, "doc_id", "text", dfCap = cap)))
  }

  test("r18 shinglesWithDf == shingle table + aggregated df, at every row") {
    // the count-over-window staging form (one h-keyed pass for both
    // index faces) must be row-identical to the agg-derived df counts
    val docs = (Seq((1L, quote), (2L, host)) ++ filler).toDF("doc_id", "text")
    val viaWindow = Containment.shinglesWithDf(docs, "doc_id", "text")
      .select("doc_id", "h", "c")
    val shd = docs
      .select(col("doc_id"), explode(
        graft.functions.GraftFunctions.textShingles(col("text"), 5)).as("g"))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.md5Prefix48(col("g")).as("h"))
      .distinct()
    val viaAgg = shd.join(
      shd.groupBy(col("h")).agg(count(lit(1)).as("c")), Seq("h"))
      .select("doc_id", "h", "c")
    assert(viaWindow.collect().map(_.toSeq).toSet ==
      viaAgg.collect().map(_.toSeq).toSet)
  }

  test("r18 fingerprint-level delta merge == aggregating the materialized updated index") {
    // q92's (old - deletes + inserts) aggregate algebra must equal the
    // row-level anti-join/union form, INCLUDING the fully-retired-doc
    // edge: doc 9's only postings sit in a bucket the delta pushes past
    // the cap, so it must drop out of the merged fingerprints entirely
    val crosser = "alpha beta gamma delta epsilon"
    def body(d: Int) = (1 to 20).map(i => s"d${d}w$i").mkString(" ")
    val old = Seq(
      (1L, s"$crosser ${body(1)}"), (2L, s"$crosser ${body(2)}"),
      (9L, crosser)) // doc 9 = ONLY the crosser phrase: fully retires
      .toDF("doc_id", "text")
    val delta = Seq((4L, s"$crosser ${body(4)}")).toDF("doc_id", "text")
    val cap = 3
    val oldDf = Containment.dfIndex(old, "doc_id", "text").localCheckpoint()
    val oldPost = Containment.postingIndex(old, "doc_id", "text", dfCap = cap)
      .localCheckpoint()
    val (_, ins, del) = Containment.postingDelta(
      oldDf, oldPost, delta, "doc_id", "text", dfCap = cap)
    def fp(df: org.apache.spark.sql.DataFrame, n: String, s: String) =
      df.groupBy(col("doc_b")).agg(count(lit(1)).as(n), sum(col("h")).as(s))
    val merged = fp(oldPost, "n0", "s0")
      .join(fp(del, "nd", "sd"), Seq("doc_b"), "full_outer")
      .join(fp(ins, "ni", "si"), Seq("doc_b"), "full_outer")
      .select(col("doc_b"),
        (coalesce(col("n0"), lit(0L)) - coalesce(col("nd"), lit(0L)) +
          coalesce(col("ni"), lit(0L))).as("n_post"),
        (coalesce(col("s0"), lit(0L)) - coalesce(col("sd"), lit(0L)) +
          coalesce(col("si"), lit(0L))).as("h_sum"))
      .filter(col("n_post") > 0)
    val rowLevel = oldPost.join(del, Seq("h", "doc_b"), "left_anti")
      .unionByName(ins)
      .groupBy(col("doc_b"))
      .agg(count(lit(1)).as("n_post"), sum(col("h")).as("h_sum"))
    assert(merged.collect().map(_.toSeq).toSet ==
      rowLevel.collect().map(_.toSeq).toSet)
    // the retirement actually fired and doc 9 is absent from BOTH forms
    assert(del.filter(col("doc_b") === 9L).count() > 0)
    assert(merged.filter(col("doc_b") === 9L).count() == 0)
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
