package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.GraftFunctions._

/** Reusable corpus-deduplication operators (SURVEY.md §2.D1–D3). The
  * oracled queries q30–q32 are thin wrappers over these; library users
  * call them directly on any DataFrame with (id, text) columns.
  *
  * Scale contract shared by all three: candidate generation is a key
  * equi-join (content hash / LSH band / SimHash band), never corpus ×
  * corpus; exact verification runs only inside buckets.
  */
object Dedup {

  /** Exact duplicate groups by content hash: one row per distinct
    * content, with the keeper (min id) and copy count.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_md5"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** Near-duplicate pairs by MinHash LSH: shingle → signature → band-key
    * self-join → exact jaccard ≥ `threshold` inside buckets. Returns
    * (doc_a, doc_b, jaccard) with doc_a < doc_b.
    *
    * The shingle/band-key subtrees are read by multiple plan branches and
    * recomputed per branch; with the native kernels that recompute is a
    * cheap scan, so nothing is persisted — the operator holds no executor
    * storage after the query finishes (a persist here would leak until
    * session end, since a lazily-returned DataFrame gives no unpersist
    * point). Callers running MANY queries over the same corpus should
    * stage `docs` themselves and persist/unpersist at their own scope.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 5, threshold: Double = 0.5): DataFrame = {
    val docs = df
      .select(col(idCol).as("doc_id"), textShingles(col(textCol), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
    val bands = docs
      .select(col("doc_id"), explode(minhashBandKeys(col("sh"))).as("bk"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val jac: Column = inter / (size(col("sh_a")) + size(col("sh_b")) - inter)
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The persistent MinHash index of a corpus: shingle and band-key
    * tables to write once (e.g. as bucketed tables on doc_id / bk) and
    * reuse for every later incremental batch.
    */
  def minhashIndex(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 5): (DataFrame, DataFrame) = {
    val docs = df
      .select(col(idCol).as("doc_id"), textShingles(col(textCol), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
    val bands = docs
      .select(col("doc_id"), explode(minhashBandKeys(col("sh"))).as("bk"))
    (docs, bands)
  }

  /** Incremental near-dedup: pairs involving at least one NEW document,
    * against a previously-built index (`minhashIndex` of the existing
    * corpus). Work scales with |new| × bucket occupancy — the existing
    * corpus is touched only through the band-key equi-join and the
    * shingle lookups for verified candidates, never rescanned or
    * re-signed. union(result, previous pairs) equals a full recompute
    * (pinned by spec).
    */
  def incrementalMinhashPairs(newDf: DataFrame, idCol: String, textCol: String,
                              oldShingles: DataFrame, oldBands: DataFrame,
                              shingleK: Int = 5,
                              threshold: Double = 0.5): DataFrame = {
    val (newShingles, newBands) = minhashIndex(newDf, idCol, textCol, shingleK)
    // new × old: every cross pair; new × new: ordered to avoid dupes
    val crossCand = newBands.as("a")
      .join(oldBands.as("b"), col("a.bk") === col("b.bk"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
    val newCand = newBands.as("a")
      .join(newBands.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val cand = crossCand.unionByName(newCand)
      .filter(col("doc_a") =!= col("doc_b"))
      .distinct()
    // defensive: a doc id present in BOTH inputs (caller misuse) must not
    // duplicate the verify-join rows
    val allShingles = oldShingles.unionByName(newShingles)
      .dropDuplicates("doc_id")
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val jac: Column = inter / (size(col("sh_a")) + size(col("sh_b")) - inter)
    cand
      .join(allShingles.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(allShingles.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Collapse near-dup pairs into groups: every document maps to the
    * minimum doc_id reachable through the pair graph (connected
    * components by iterative min-label propagation — "hash-to-min").
    * Converges in O(component diameter) rounds; each round is one
    * edge⋈label join + min-aggregate. Previous-round results are
    * persisted and the old round unpersisted so lineage stays flat —
    * THE failure mode of iterative Spark jobs at scale is an
    * ever-growing plan, not the joins themselves.
    *
    * Input: (doc_a, doc_b) pairs (any orientation). Output:
    * (doc_id, keeper) for every document appearing in a pair; docs in no
    * pair are their own keeper and are omitted.
    *
    * The returned DataFrame IS the converged, materialized cache entry
    * (recomputing it would re-run the iteration); call `.unpersist()` on
    * it when done — the intermediate per-round caches and the edge table
    * are already released internally.
    */
  def keepers(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("doc_id"))
      .distinct()
      .withColumn("keeper", col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var iter = 0
    var converged = false
    var cached = labels
    while (iter < maxIter && !converged) {
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("doc_id", "dst")
          .withColumnRenamed("keeper", "n_keeper"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("n_keeper")).as("n_keeper"))
      // old_keeper rides along so convergence is a filter over the cached
      // round result — no extra labels join per round
      val next = labels.join(viaNeighbor, Seq("doc_id"), "left")
        .select(col("doc_id"), col("keeper").as("old_keeper"),
          least(col("keeper"), coalesce(col("n_keeper"), col("keeper")))
            .as("keeper"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.filter(col("keeper") =!= col("old_keeper")).count()
      cached.unpersist()
      cached = next
      // selecting off the cached frame reuses its InMemoryRelation scan
      labels = next.select(col("doc_id"), col("keeper"))
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    // re-materialize the final labels as their own cache entry so the
    // documented contract holds (caller unpersists the RETURNED frame),
    // then release the last round's internal cache
    val result = labels.persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    if (!(cached eq result)) cached.unpersist()
    result
  }

  /** Near-duplicate pairs by 64-bit SimHash within `maxHamming` bit
    * flips. Band count is pigeonhole-derived (maxHamming+1 bands ⇒ any
    * qualifying pair agrees exactly on ≥1 band), so the band join is
    * EXACT, not probabilistic.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    val bandBits = 64 / nBands
    val mask = (1L << bandBits) - 1
    val docs = df.select(col(idCol).as("doc_id"),
      simhash64(tokens(col(textCol))).as("sig"))
    val bands = docs.select(col("doc_id"), col("sig"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"), shiftrightunsigned(col("sig"), bandBits * b)
          .bitwiseAND(lit(mask)).as("bval"))
      }: _*)).as("bk"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
