package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Reusable approximate-nearest-neighbor operators over quantized
  * embeddings (SURVEY.md §2.D6/D7/D7b). All take a corpus DataFrame with
  * columns (`id`, `qv`) where qv = GraftFunctions.quantize(embedding);
  * the oracled queries q34/q35/q36/q43 are thin wrappers.
  *
  * Scale contract: the corpus is never self-joined without a key —
  * brute force broadcasts the (small) query batch over one corpus scan
  * and reduces with a partial top-k aggregate (no corpus-sized shuffle);
  * LSH and IVF generate candidates through band/cell equi-joins; IVF
  * cell assignment is a map-side argmax over a broadcast codebook (zero
  * exchange).
  */
object Ann {

  private def cos(qa: Column, qb: Column, da: Column, db: Column): Column =
    quantDot(qa, qb).cast("double") / sqrt(da * db)

  private def withSelfDot(df: DataFrame): DataFrame =
    df.withColumn("selfdot", quantDot(col("qv"), col("qv")).cast("double"))

  /** Scored candidates reduced to per-query top-k via the TopKPairs
    * partial aggregate: map-side partials carry ≤ k rows per query per
    * partition into the exchange, so the shuffle is O(partitions ×
    * |queries| × k) regardless of corpus size. Tie-break (score desc,
    * id asc) matches the window formulation the oracles replay.
    */
  private def topK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("q_id"))
      .agg(topKPairs(col("c"), col("id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("neighbor"),
        col("col.score").as("cos_sim"), (col("pos") + 1).cast("int").as("rn"))

  /** Exact top-k per query by cosine: broadcast query batch × one corpus
    * scan, partial top-k per partition, tiny final merge per query. The
    * baseline every approximate path is measured against.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     k: Int = 10): DataFrame = {
    val c = withSelfDot(corpus)
    val q = withSelfDot(queries)
      .select(col("id").as("q_id"), col("qv").as("q_qv"),
        col("selfdot").as("q_dot"))
    topK(
      c.join(broadcast(q), col("id") =!= col("q_id"))
        .select(col("q_id"), col("id"),
          cos(col("q_qv"), col("qv"), col("q_dot"), col("selfdot")).as("c")),
      k)
  }

  /** Candidate near-neighbor pairs via hyperplane LSH: `planes`-bit
    * Rademacher signature, banded into `bands` keys; pairs sharing a
    * band verify with exact cosine ≥ `threshold`.
    *
    * `bitsPerBand` is the SCALE knob: band b reads `bitsPerBand` bits at
    * stride planes/bands, so bucket count per band is 2^bitsPerBand and
    * expected bucket occupancy is n / 2^bitsPerBand. A fixed band width
    * makes candidate volume quadratic in corpus size (the sf1 rehearsal
    * measured q36 at 162M candidate pairs, 2 GB shuffled, from 20k
    * vectors at 4 bits); callers must grow bitsPerBand ~ log2(n) to hold
    * occupancy — and with it candidate count per vector — constant.
    * 0 (default) = use the full stride, the pre-rehearsal behavior.
    */
  def lshPairs(corpus: DataFrame, planes: Int = 16, bands: Int = 4,
               threshold: Double = 0.3, bitsPerBand: Int = 0): DataFrame = {
    val stride = planes / bands
    val bits = if (bitsPerBand > 0) bitsPerBand else stride
    require(bits <= stride, s"bitsPerBand $bits exceeds stride $stride")
    val mask = (1L << bits) - 1
    // self-dots precomputed per row: the in-bucket verify then costs ONE
    // native 64-long dot per candidate pair (same doubles as quantCosine)
    val embs = withSelfDot(corpus.select(col("id").as("vec_id"), col("qv")))
      .withColumn("sig", hyperplaneSig(col("qv"), planes))
    val banded = embs.select(col("vec_id"), col("qv"), col("selfdot"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), shiftrightunsigned(col("sig"), stride * b)
          .bitwiseAND(lit(mask)).as("bval"))
      }: _*)).as("bk"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cos(col("a.qv"), col("b.qv"), col("a.selfdot"), col("b.selfdot"))
          .as("cos_sim"))
      .distinct()
      .filter(col("cos_sim") >= threshold)
  }

  /** LSH band width for corpus size `n`: smallest width in 4..16 whose
    * expected bucket occupancy n/2^bits is ≤ `target`. Integer-exact
    * ladder (NOT float log2) so the DuckDB oracle's CASE replays it
    * bit-identically — libm rounding at an exact power-of-two boundary
    * could differ between engines.
    *
    * The ceiling tracks the signature stride: callers pass planes=64 /
    * bands=4 (stride 16), so the ladder can keep occupancy ≤ target up
    * to n = target·2^16 ≈ 4.9M vectors. The previous 32-plane/8-bit cap
    * made candidate volume quadratic past n = target·256 — the sf10
    * rehearsal measured q36 at 312M candidate pairs from 200k vectors,
    * with the NEXT decade due to double the per-vector candidate count
    * again; each +1 bit halves it instead.
    */
  def lshBitsFor(n: Long, target: Long = 75L): Int = {
    var bits = 4
    while (bits < 16 && n > (target << bits)) bits += 1
    bits
  }

  /** IVF centroid count for corpus size `n`: k = ⌊√n⌋ (min 16), the
    * classic IVF balance point. The total work of a blocked pairwise /
    * probe pipeline is n·k (every vector scores every centroid in the
    * assign pass) + n·(n/k) (in-cell candidate work); k ~ n/target keeps
    * the second term linear but makes the ASSIGN pass n²/target — the
    * sf20 rehearsal measured it at 1.6B centroid dots, 80× the pairwise
    * work, with the old 4096 clamp only capping (and hiding) it. √n
    * minimizes the sum at O(n^1.5) with no clamp for a quadratic to
    * hide behind; the broadcast codebook stays tiny far past any
    * single-machine corpus (√10⁹ ≈ 31.6k centroids ≈ 16 MB — the
    * two-level IVF frontier is ~n=10¹², documented, not silently
    * clamped). History: fixed k=16 was quadratic in the verify (sf1,
    * 162M pairs from 20k vectors); n/75 fixed that and moved the
    * quadratic into the assign (sf20) — the lesson is the SUM is the
    * objective, not either term.
    *
    * Floor-of-double-sqrt is engine-exact for the replaying oracle:
    * IEEE sqrt is correctly rounded, n ≪ 2^52, and a correctly-rounded
    * sqrt of a non-square never lands on the next integer, so
    * FLOOR(SQRT(n)) in DuckDB == math.sqrt(n).toLong here, bit-for-bit.
    */
  def centroidCountFor(n: Long): Long =
    math.max(16L, math.sqrt(n.toDouble).toLong)

  /** One-row codebook frame: the centroid set collapsed into a single
    * sorted array<struct<c_id,c_qv,c_dot>> column, hinted broadcast. A
    * cross join against it is a BroadcastNestedLoopJoin with a ONE-ROW
    * build side — effectively a free per-row constant, never a corpus
    * move. Codebooks are small by construction (IVF uses √n..n/1e3
    * centroids; they fit an executor by the same argument that makes IVF
    * work at all).
    */
  private[operators] def codebookOf(cents: DataFrame): DataFrame =
    broadcast(cents.agg(graft.functions.GraftFunctions.nonEmptySample(
      sort_array(collect_list(
        struct(col("c_id"), col("c_qv"), col("c_dot")))),
      "Ann.codebookOf").as("cb")))

  /** Corpus → (vec_id, qv, selfdot, cell): every vector labeled with its
    * nearest centroid by a map-side native argmax over the broadcast
    * codebook. Zero exchange — the plan is scan → project.
    */
  def ivfAssign(corpus: DataFrame, centroidFilter: Column): DataFrame = {
    val embs = withSelfDot(corpus).withColumnRenamed("id", "vec_id")
    val cents = embs.filter(centroidFilter)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"),
        col("selfdot").as("c_dot"))
    assignTo(embs, cents)
  }

  /** ivfAssign with an EXPLICIT codebook (c_id, c_qv) — e.g. one
    * refined by `Cluster.kmeansCodebook`. A raw uniform sample bounds
    * cell size only probabilistically (the sf1 rehearsal measured max
    * cell 447 vs median 7 under intrinsic cluster structure); a
    * kmeans-refined codebook re-centers on the direction families, so
    * in-cell pairwise work tracks true cluster sizes. Same plan shape:
    * one-row broadcast codebook, scan → project, zero exchange.
    */
  def ivfAssignWith(corpus: DataFrame, codebook: DataFrame): DataFrame = {
    val embs = withSelfDot(corpus).withColumnRenamed("id", "vec_id")
    val cents = codebook.select(col("c_id"), col("c_qv"),
      quantDot(col("c_qv"), col("c_qv")).cast("double").as("c_dot"))
    assignTo(embs, cents)
  }

  private def assignTo(embs: DataFrame, cents: DataFrame): DataFrame =
    embs.crossJoin(codebookOf(cents))
      .select(col("vec_id"), col("qv"), col("selfdot"),
        nearestCentroid(col("qv"), col("selfdot"), col("cb")).as("cell"))

  /** IVF: assign every vector to its nearest codebook centroid (map-side
    * argmax, zero exchange), probe the `nprobe` nearest cells per query,
    * exact re-rank inside the probed cells with a partial top-k. Each
    * vector lives in exactly one cell and a query's probed cells are
    * distinct, so candidates are already unique — no distinct pass.
    */
  def ivfTopK(corpus: DataFrame, queryFilter: Column, centroidFilter: Column,
              nprobe: Int = 4, k: Int = 10): DataFrame = {
    val embs = withSelfDot(corpus).withColumnRenamed("id", "vec_id")
    val cents = embs.filter(centroidFilter)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"),
        col("selfdot").as("c_dot"))
    ivfTopKCents(embs, cents, queryFilter, nprobe, k)
  }

  /** ivfTopK with an EXPLICIT codebook (c_id, c_qv) — the production
    * path: pair with `Cluster.kmeansCodebook` so cells track the data's
    * intrinsic direction families rather than the raw sample's luck
    * (q67). Same plan shape: zero-exchange assignment, broadcast probe
    * batch, cell-key equi-join, partial top-k.
    */
  def ivfTopKWith(corpus: DataFrame, codebook: DataFrame,
                  queryFilter: Column, nprobe: Int = 4,
                  k: Int = 10): DataFrame = {
    val embs = withSelfDot(corpus).withColumnRenamed("id", "vec_id")
    val cents = codebook.select(col("c_id"), col("c_qv"),
      quantDot(col("c_qv"), col("c_qv")).cast("double").as("c_dot"))
    ivfTopKCents(embs, cents, queryFilter, nprobe, k)
  }

  private def ivfTopKCents(embs: DataFrame, cents: DataFrame,
                           queryFilter: Column, nprobe: Int,
                           k: Int): DataFrame = {
    val assign = assignTo(embs, cents)
    val probes = embs.filter(queryFilter).crossJoin(codebookOf(cents))
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("selfdot").as("q_dot"),
        explode(nearestCells(col("qv"), col("selfdot"), col("cb"), nprobe))
          .as("cell"))
    topK(
      assign.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("id"),
          cos(col("q_qv"), col("qv"), col("q_dot"), col("selfdot")).as("c")),
      k)
  }

  /** Coarse centroid count for the two-level index: c₁ = ⌊∛n⌋ (min 8),
    * computed with an exact integer ladder — NOT Math.cbrt, which is not
    * required to be correctly rounded by IEEE 754, so FLOOR(CBRT(n))
    * could disagree between engines at a perfect cube. The oracle
    * replays the same ladder as MAX(c) over a bounded range WHERE
    * c*c*c <= n (integer compares only; bit-exact in any engine).
    *
    * Why ∛n: the single-level index at k = √n broadcasts the whole
    * codebook, which stops fitting an executor at n ≈ 10¹²
    * (√10¹² × 64 dims × 8 B ≈ 512 MB). Two levels split the work
    * n·c₁ (coarse assign) + n·c₂ (fine assign inside the coarse cell)
    * + n·(n/(c₁·c₂)) (in-cell candidates); c₁ = c₂ = ∛n balances all
    * three at O(n^{4/3}) TOTAL work with a broadcast codebook of only
    * ∛n rows (10⁴ at n = 10¹² — trivially broadcastable) — strictly
    * better asymptotics than the single-level O(n^{3/2}) AND a smaller
    * broadcast. The price is one keyed corpus shuffle (the fine-codebook
    * equi-join), which is linear and AQE-skew-safe.
    */
  def coarseCountFor(n: Long): Long = {
    var c = 1L
    while (c < 2097151L && (c + 1) * (c + 1) * (c + 1) <= n) c += 1
    math.max(8L, c)
  }

  /** Two-level IVF assignment — the scale path past the single-level
    * broadcast frontier (see coarseCountFor). Every vector gets
    * (cell1, cell2): cell1 by map-side argmax over the broadcast coarse
    * codebook (zero exchange, same kernel as ivfAssign), cell2 by argmax
    * over the FINE centroids of its own coarse cell — fine centroids are
    * the `fineFilter` rows labeled by the same coarse pass, collapsed to
    * one codebook array row per coarse cell and equi-joined on cell1
    * (c₁ rows; a broadcast at test scale, a keyed shuffle join at 10¹²).
    * A coarse cell with no fine seed keeps cell2 = -1 (its rows block
    * together unsplit). Deterministic end-to-end: both argmaxes tie-break
    * (cosine desc, id asc), so DuckDB replays the full assignment.
    */
  def twoLevelAssign(corpus: DataFrame, coarseFilter: Column,
                     fineFilter: Column): DataFrame =
    twoLevelParts(corpus, coarseFilter, fineFilter)._3

  /** Shared internals of the two-level index: (embs+selfdot, per-cell
    * fine codebooks, full (cell1, cell2) assignment). The fine codebook
    * of coarse cell c is the `fineFilter` rows that COARSE-assign to c,
    * collapsed into one sorted array row — ≤ c₁ rows total, equi-joined
    * (never broadcast as a whole).
    */
  private def twoLevelParts(corpus: DataFrame, coarseFilter: Column,
                            fineFilter: Column): (DataFrame, DataFrame, DataFrame) = {
    val embs = withSelfDot(corpus).withColumnRenamed("id", "vec_id")
    val cents = embs.filter(coarseFilter)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"),
        col("selfdot").as("c_dot"))
    twoLevelPartsCents(embs, cents, fineFilter)
  }

  private def twoLevelPartsCents(embs: DataFrame, cents: DataFrame,
                                 fineFilter: Column): (DataFrame, DataFrame, DataFrame) = {
    val coarse = assignTo(embs, cents).withColumnRenamed("cell", "cell1")
    val fine = coarse.filter(fineFilter)
      .groupBy(col("cell1"))
      .agg(sort_array(collect_list(struct(col("vec_id").as("c_id"),
        col("qv").as("c_qv"), col("selfdot").as("c_dot")))).as("fb"))
    val assign = coarse.join(fine, Seq("cell1"), "left")
      .select(col("vec_id"), col("qv"), col("selfdot"), col("cell1"),
        coalesce(nearestCentroid(col("qv"), col("selfdot"), col("fb")),
          lit(-1L)).as("cell2"))
    (embs, fine, assign)
  }

  /** Two-level cell-blocked near-duplicate pairs: cellBlockedPairs'
    * contract with (cell1, cell2) as the blocking key — in-cell
    * candidate work shrinks from n/√n to n/(c₁·c₂) rows per block while
    * the broadcast stays ∛n. Exact cosine verify ≥ `threshold` as
    * everywhere else (SURVEY.md §2.D5/D7b scale path).
    */
  def twoLevelBlockedPairs(corpus: DataFrame, coarseFilter: Column,
                           fineFilter: Column,
                           threshold: Double): DataFrame = {
    val assign = twoLevelAssign(corpus, coarseFilter, fineFilter)
    assign.as("a")
      .join(assign.as("b"),
        col("a.cell1") === col("b.cell1") &&
          col("a.cell2") === col("b.cell2") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cos(col("a.qv"), col("b.qv"), col("a.selfdot"), col("b.selfdot"))
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Two-level IVF top-k probe — ANN search through the same two-stage
    * index as twoLevelAssign: a query probes its `nprobe1` nearest
    * coarse cells (broadcast ∛n codebook), then within EACH probed
    * coarse cell its `nprobe2` nearest fine centroids (per-cell fine
    * codebook equi-joined on cell1), and candidates are the corpus rows
    * sharing a probed (cell1, cell2); exact re-rank via the TopKPairs
    * partial aggregate. Coarse cells with no fine seed contribute their
    * whole cell (cell2 = -1 matches the assignment side). Candidates are
    * unique by construction — a vector lives in exactly one (cell1,
    * cell2) and a query's probed pairs are distinct — so no distinct
    * pass, mirroring ivfTopK.
    */
  def twoLevelTopK(corpus: DataFrame, coarseFilter: Column,
                   fineFilter: Column, queryFilter: Column,
                   nprobe1: Int = 4, nprobe2: Int = 4,
                   k: Int = 10): DataFrame = {
    val (embs, fine, assign) = twoLevelParts(corpus, coarseFilter, fineFilter)
    val cents = embs.filter(coarseFilter)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"),
        col("selfdot").as("c_dot"))
    twoLevelProbe(embs, cents, fine, assign, queryFilter, nprobe1, nprobe2, k)
  }

  private def twoLevelProbe(embs: DataFrame, cents: DataFrame,
                            fine: DataFrame, assign: DataFrame,
                            queryFilter: Column, nprobe1: Int,
                            nprobe2: Int, k: Int): DataFrame = {
    val coarseProbes = embs.filter(queryFilter).crossJoin(codebookOf(cents))
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("selfdot").as("q_dot"),
        explode(nearestCells(col("qv"), col("selfdot"), col("cb"), nprobe1))
          .as("cell1"))
    val probes = coarseProbes.join(fine, Seq("cell1"), "left")
      .select(col("q_id"), col("q_qv"), col("q_dot"), col("cell1"),
        explode(coalesce(
          nearestCells(col("q_qv"), col("q_dot"), col("fb"), nprobe2),
          array(lit(-1L)))).as("cell2"))
    topK(
      assign.join(broadcast(probes), Seq("cell1", "cell2"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("id"),
          cos(col("q_qv"), col("qv"), col("q_dot"), col("selfdot")).as("c")),
      k)
  }

  /** twoLevelTopK with an EXPLICIT coarse codebook (c_id, c_qv) — e.g.
    * one kmeans-refined by `Cluster.kmeansCodebook`. Fine seeds stay a
    * corpus sample (`fineFilter` over the coarse-assigned rows). Same
    * plan shape: broadcast ∛n coarse argmax, per-cell fine codebooks
    * equi-joined on cell1, blocked candidates, partial top-k.
    */
  def twoLevelTopKWith(corpus: DataFrame, coarseCodebook: DataFrame,
                       fineFilter: Column, queryFilter: Column,
                       nprobe1: Int = 4, nprobe2: Int = 4,
                       k: Int = 10): DataFrame = {
    val embs = withSelfDot(corpus).withColumnRenamed("id", "vec_id")
    val cents = coarseCodebook.select(col("c_id"), col("c_qv"),
      quantDot(col("c_qv"), col("c_qv")).cast("double").as("c_dot"))
    val (_, fine, assign) = twoLevelPartsCents(embs, cents, fineFilter)
    twoLevelProbe(embs, cents, fine, assign, queryFilter, nprobe1, nprobe2, k)
  }

  /** The PRODUCTION plain-IVF probe face (round 16 — the
    * `IvfPq.ivfPqAutoTopK` treatment applied to q43's path): the index
    * shape is a corpus-size decision. Below `IvfPq.twoLevelThreshold`
    * the single-level √n face runs (oracle-replayable; both faces are
    * job-floor-dominated down there). At or above it the probe routes
    * through the two-level (∛n coarse broadcast + per-cell fine
    * codebooks) index, so no shipped ANN face pays the single-level
    * coarse assign's O(n·√n) CPU at scale — the r15 adjudication
    * measured that face at 2.9×/2.5× wall per 2× data (the √2·2 ≈ 2.83
    * structural class) while the two-level rows sit at 2^{4/3} ≈ 2.52.
    * Output shape is identical either way; q68 audits the sub-threshold
    * face's recall, q71 the above-threshold one's.
    */
  def ivfAutoTopK(corpus: DataFrame, n: Long, queryFilter: Column,
                  nprobe: Int = 4, k: Int = 10): DataFrame =
    if (n >= IvfPq.twoLevelThreshold) {
      val c1 = coarseCountFor(n)
      twoLevelTopK(corpus,
        coarseFilter = graft.functions.GraftFunctions
          .idSample(col("vec_id"), math.max(1L, n / c1)),
        fineFilter = graft.functions.GraftFunctions
          .idSample(col("vec_id"), math.max(1L, n / (c1 * c1))),
        queryFilter, nprobe1 = nprobe, nprobe2 = nprobe, k = k)
    } else {
      val stride = math.max(1L, n / centroidCountFor(n))
      ivfTopK(corpus, queryFilter,
        centroidFilter = graft.functions.GraftFunctions
          .idSample(col("vec_id"), stride),
        nprobe = nprobe, k = k)
    }

  /** The PRODUCTION kmeans-refined IVF probe face (q67's path, same
    * corpus-size routing as `ivfAutoTopK`). Below the threshold: the
    * single-level √n-seed kmeans codebook (the oracled replay face).
    * At or above: the COARSE level is a kmeans-refined ∛n codebook —
    * one Lloyd round over ∛n centroids is O(n·∛n) = O(n^{4/3}), the
    * same class as the index it feeds — and fine seeds stay a corpus
    * sample, so the refinement benefit (cell occupancy tracking true
    * direction families) lands where it matters most: the level whose
    * cells block the candidate work.
    */
  def ivfKmeansAutoTopK(corpus: DataFrame, n: Long, queryFilter: Column,
                        rounds: Int = 1, nprobe: Int = 4,
                        k: Int = 10): DataFrame =
    if (n >= IvfPq.twoLevelThreshold) {
      val c1 = coarseCountFor(n)
      val coarseCb = Cluster.kmeansCodebook(corpus,
        graft.functions.GraftFunctions
          .idSample(col("id"), math.max(1L, n / c1)), rounds)
      twoLevelTopKWith(corpus, coarseCb,
        fineFilter = graft.functions.GraftFunctions
          .idSample(col("vec_id"), math.max(1L, n / (c1 * c1))),
        queryFilter, nprobe1 = nprobe, nprobe2 = nprobe, k = k)
    } else {
      val cb = Cluster.kmeansCodebook(corpus,
        graft.functions.GraftFunctions.idSample(col("id"),
          math.max(1L, n / centroidCountFor(n))), rounds)
      ivfTopKWith(corpus, cb, queryFilter, nprobe, k)
    }

  /** Cell-blocked exact near-duplicate pairs: vectors pair only within
    * their IVF cell (same deterministic assignment as ivfTopK), verified
    * with exact cosine ≥ `threshold`. The corpus-level embedding-dedup
    * shape: one zero-exchange assignment pass + one cell-key equi-join —
    * never corpus × corpus (SURVEY.md §2.D5).
    */
  def cellBlockedPairs(corpus: DataFrame, centroidFilter: Column,
                       threshold: Double): DataFrame = {
    val assign = ivfAssign(corpus, centroidFilter)
    assign.as("a")
      .join(assign.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cos(col("a.qv"), col("b.qv"), col("a.selfdot"), col("b.selfdot"))
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
