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
                   shingleK: Int = 5, threshold: Double = 0.5,
                   perms: Int = graft.functions.GraftFunctions.MinhashPerms,
                   bands: Int = graft.functions.GraftFunctions.MinhashBands,
                   stage: Boolean = false): DataFrame = {
    // stage=true materializes the shingle table ONCE (localCheckpoint —
    // blocks freed when the frame is GC'd, no cache-ownership leak) so
    // the band-join and the two verify joins don't re-shingle the
    // corpus; costs eagerness at construction. The default keeps the
    // operator lazy — see the cache-ownership note above.
    val docs0 = df
      .select(col(idCol).as("doc_id"), textShingles(col(textCol), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
    val docs = if (stage) docs0.localCheckpoint() else docs0
    val bands0 = docs
      .select(col("doc_id"),
        explode(minhashBandKeys(col("sh"), perms, bands)).as("bk"))
    val cand = bands0.as("a")
      .join(bands0.as("b"),
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

  /** Adapt the live per-doc index table (doc_id, sh, bks) — the
    * merge-on-read table C17's `minhashIndexStream` maintains — to the
    * (shingles, bands) pair `incrementalMinhashPairs` consumes. The
    * band explode is scan-local; no shuffle is added over the batch
    * `minhashIndex` shape.
    */
  def minhashIndexFromLive(live: DataFrame): (DataFrame, DataFrame) =
    (live.select(col("doc_id"), col("sh")),
      live.select(col("doc_id"), explode(col("bks")).as("bk")))

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

  /** Connected components with adaptive dispatch — the q54 production
    * entry point. The VERIFIED near-dup pair graph is orders of magnitude
    * smaller than the corpus (the whole point of dedup: most documents
    * pair with nothing), so the common case fits one task: union-find
    * with path compression over the staged edge list, a single fused job
    * with no per-round scheduling at all. Graphs past `smallEdgeLimit`
    * edges (or with non-integral ids) take `keepersStar`, the
    * diameter-independent iterative path. Both produce the identical
    * (doc_id, keeper = component-minimum id) frame, so callers and
    * oracles never see which side ran — the same correctness-gated
    * adaptivity pattern as Ann.centroidCountFor/lshBitsFor.
    *
    * The limit bounds ONE task's memory (two long maps over edges+nodes,
    * ~100 MB at the default 1M edges) — at 100 TB a pair graph past it
    * means near-dup structure heavy enough that the O(log²|V|) star
    * rounds are worth their scheduling cost.
    */
  def keepersAuto(pairs: DataFrame,
                  smallEdgeLimit: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.types._
    val integralIds = pairs.schema("doc_a").dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _                                             => false
    }
    // one eager materialization feeds the size probe AND whichever CC
    // path runs (the pair subtree is the expensive minhash pipeline)
    val staged = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint()
    if (integralIds && staged.count() <= smallEdgeLimit)
      keepersFused(staged)
    else keepersStar(staged)
  }

  /** Single-task union-find over an integral-id pair list: keeper = the
    * set minimum by rooting every union at the smaller id (path halving
    * keeps chains amortized-flat). One narrow coalesce — no shuffle, no
    * rounds. Returned frame is materialized (contract parity with
    * `keepers`/`keepersStar`); caller unpersists.
    */
  private[operators] def keepersFused(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val idType = pairs.schema("doc_a").dataType
    val result = pairs
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x0: Long): Long = {
          var x = x0
          var p = parent.getOrElse(x, x)
          while (p != x) {
            val gp = parent.getOrElse(p, p)
            parent(x) = gp // path halving
            x = p; p = parent.getOrElse(x, x)
          }
          x
        }
        val seen = scala.collection.mutable.LongMap.empty[Unit]
        it.foreach { case (a, b) =>
          seen(a) = (); seen(b) = ()
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        seen.keysIterator.map(x => (x, find(x)))
      }
      .toDF("doc_id", "keeper")
      // ids went through long for the union-find maps; restore the
      // caller's exact column type so the fused path is schema-invisible
      .select(col("doc_id").cast(idType), col("keeper").cast(idType))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    result
  }

  /** Connected components by alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the scale path for `keepers`: converges in O(log²
    * |V|) rounds regardless of component DIAMETER, where min-label
    * propagation needs O(diameter) rounds. A 100 TB web-dedup graph has
    * chain-shaped components (page A ≈ B ≈ C …) that make diameter the
    * binding constraint; star contraction rewires every node toward the
    * component minimum each round instead of walking one hop.
    *
    * Per round: large-star points every node's larger neighbors at its
    * local minimum (one groupBy + one join over the undirected edge
    * view), small-star folds the remaining smaller neighbors onto the
    * minimum (same shape over the canonical larger→smaller edges). Both
    * are key-partitioned aggregates/joins — no driver-side graph state;
    * lineage stays flat via per-round persist/unpersist exactly like
    * `keepers`.
    *
    * Same contract as `keepers`: input (doc_a, doc_b) pairs, output
    * (doc_id, keeper) for every document in a pair, keeper = component
    * minimum; the returned frame is the materialized cache entry —
    * caller unpersists.
    */
  def keepersStar(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // Lineage control: each round REWRITES the whole edge set (the union
    // of both orientations roughly triples the plan per round, so the
    // logical plan grows EXPONENTIALLY — persist truncates execution but
    // not the plan tree, and Spark stringifies the plan on every action).
    // localCheckpoint cuts the plan to the materialized RDD each round;
    // on a cluster with fault-tolerance requirements, substitute
    // `checkpoint` against a reliable dir — same call site.
    // materialize the input ONCE: nodes and edges both derive from it,
    // and `pairs` is typically an expensive subtree (the minhash pair
    // pipeline) that must not run per derivation
    val p0 = pairs.select(col("doc_a"), col("doc_b")).localCheckpoint()
    // every document in a pair is a node (matching `keepers`, a node
    // whose only pair is a self-loop still keeps itself)
    val nodes = p0.select(col("doc_a").as("doc_id"))
      .unionByName(p0.select(col("doc_b").as("doc_id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // canonical u > v edges, self-loops dropped
    val edges0 = p0
      .filter(col("doc_a") =!= col("doc_b"))
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .distinct()
      .localCheckpoint()

    var edges = edges0
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // large-star: for every node u (over the undirected neighborhood),
      // m = min(N(u) ∪ {u}); emit (v, m) for neighbors v > u
      val und = edges.select(col("u"), col("v"))
        .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = und.groupBy("u")
        .agg(least(min(col("v")), col("u")).as("m"))
      val afterLarge = und.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star: over canonical u > v edges, m = min neighbor of u;
      // emit (v, m) for the other small neighbors plus (u, m)
      val sMins = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      val next = afterLarge.join(sMins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(sMins.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint()
      // converged when the round produced no edge outside the current set
      val changed = next.join(edges, Seq("u", "v"), "left_anti")
        .limit(1).count()
      edges = next
      converged = changed == 0
      iter += 1
    }

    // at convergence edges form stars rooted at component minima; roots
    // appear only on the v side and keep themselves
    val result = nodes
      .join(edges.groupBy(col("u").as("doc_id"))
        .agg(min(col("v")).as("star_keeper")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("star_keeper"), col("doc_id")).as("keeper"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    nodes.unpersist()
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
