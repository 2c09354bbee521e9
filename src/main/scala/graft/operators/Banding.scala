package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Cost-based MinHash banding (SURVEY.md §2.D2): pick the LSH band/row
  * shape (b bands × r rows) for a dedup threshold θ from the corpus
  * itself, instead of a compile-time constant.
  *
  * The collision probability of a pair at jaccard j under (b, r) banding
  * is the S-curve p(j) = 1 − (1 − j^r)^b. The chooser:
  *
  *   1. samples the corpus (hash-ordered top-N: deterministic, one scan,
  *      TakeOrdered — no full sort) and measures the EMPIRICAL jaccard
  *      histogram of sampled pairs — the workload's actual similarity
  *      mass, where the textbook analysis assumes a distribution;
  *   2. enumerates (b, r) shapes with b·r ≤ maxPerms;
  *   3. keeps shapes whose worst-case recall at the threshold — p(θ),
  *      the S-curve floor over every pair the operator must find —
  *      meets `targetRecall`;
  *   4. among those, minimizes expected cost = expected false-candidate
  *      mass under the empirical histogram (the in-bucket verify work)
  *      + permCostWeight · b·r (the per-doc signature work).
  *
  * This is plan-time statistics collection, like Catalyst column stats:
  * the sampled histogram crosses the driver (bounded: sampleSize² pair
  * buckets aggregated to ≤100 rows), never the corpus.
  */
object Banding {

  /** A chosen banding shape with its predicted operating point. */
  case class Choice(perms: Int, bands: Int, rows: Int,
                    recallAtThreshold: Double, expectedFalseCandidates: Double)

  /** S-curve: probability a pair at jaccard `j` shares ≥1 band key. */
  def collisionProb(j: Double, bands: Int, rows: Int): Double =
    1.0 - math.pow(1.0 - math.pow(j, rows), bands)

  /** Enumerate shapes and choose per the cost model above — pure math
    * over a (jaccardBucket → pairCount) histogram, unit-testable without
    * Spark. Buckets are midpoints in [0, 1).
    */
  def chooseFromHistogram(hist: Map[Double, Long], threshold: Double,
                          maxPerms: Int = 64, targetRecall: Double = 0.95,
                          permCostWeight: Double = 1e-3): Choice = {
    val shapes = for {
      r <- 1 to maxPerms
      b <- 1 to maxPerms / r
    } yield (b, r)
    val viable = shapes
      .map { case (b, r) => (b, r, collisionProb(threshold, b, r)) }
      .filter(_._3 >= targetRecall)
    require(viable.nonEmpty,
      s"no banding within $maxPerms perms reaches recall $targetRecall at j=$threshold")
    val scored = viable.map { case (b, r, recall) =>
      val fp = hist.collect {
        case (j, n) if j < threshold => n * collisionProb(j, b, r)
      }.sum
      (Choice(b * r, b, r, recall, fp), fp + permCostWeight * b * r)
    }
    scored.minBy { case (c, cost) => (cost, c.perms, -c.rows) }._1
  }

  /** Measure the sampled-pair jaccard histogram and choose. One Spark
    * job: sample × sample shingle jaccard (sampleSize² pairs — bounded,
    * independent of corpus size), bucketed to 0.02 grain.
    */
  def choose(df: DataFrame, idCol: String, textCol: String,
             threshold: Double, shingleK: Int = 5, maxPerms: Int = 64,
             targetRecall: Double = 0.95, sampleSize: Int = 200): Choice = {
    // localCheckpoint: both sides of the pair join read the SAME
    // materialized sample — without it each join side re-runs the
    // corpus scan + shingle + TakeOrdered subtree
    val sample = df
      .select(col(idCol).as("doc_id"),
        textShingles(col(textCol), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
      .orderBy(xxhash64(col("doc_id"))) // deterministic TakeOrdered sample
      .limit(sampleSize)
      .localCheckpoint()
    val inter = size(array_intersect(col("a.sh"), col("b.sh")))
    val jac = inter / (size(col("a.sh")) + size(col("b.sh")) - inter)
    val hist = sample.as("a")
      .join(sample.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select((floor(jac * 50) / lit(50.0) + lit(0.01)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    chooseFromHistogram(hist, threshold, maxPerms, targetRecall)
  }

  /** Near-dup pairs with the banding chosen from the corpus itself:
    * `Banding.choose` then `Dedup.minhashPairs` under that shape.
    */
  def minhashPairsAuto(df: DataFrame, idCol: String, textCol: String,
                       shingleK: Int = 5, threshold: Double = 0.5,
                       maxPerms: Int = 64,
                       targetRecall: Double = 0.95): DataFrame = {
    val c = choose(df, idCol, textCol, threshold, shingleK, maxPerms,
      targetRecall)
    Dedup.minhashPairs(df, idCol, textCol, shingleK, threshold,
      perms = c.perms, bands = c.bands)
  }
}
