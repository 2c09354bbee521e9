package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.GraftFunctions._

/** Shingle-containment near-dup detection (SURVEY.md §2.D30) — the
  * ASYMMETRIC similarity the jaccard family cannot express: a short
  * document quoted or wrapped inside a long one has
  * C(A→B) = |S(A)∩S(B)| / |S(A)| ≈ 1 while jaccard ≈ |A|/|B| ≈ 0, so
  * MinHash banding (tuned for symmetric overlap) never surfaces the
  * pair. Production curation runs this as the quote/wrapper/boilerplate
  *-inclusion pass (Broder's containment sketches, SEQUENCES '97 — the
  * same paper that gave MinHash its resemblance form).
  *
  * Scale shape (everything keyed, nothing corpus²):
  *   - the (doc, shingle-hash) table is ONE explode of the corpus,
  *     staged because five consumers read it — to DISK_ONLY storage:
  *     it is the largest staged table in the suite (~120 rows/doc at
  *     any corpus size, ~600M rows at 5M docs), and the default
  *     memory-first residency pinned it against the very heap the five
  *     consumers' aggregation maps need (measured: the sf100 probe's
  *     steady-state repeats heap-OOM'd a 24 GiB JVM; disk-backed
  *     blocks cost one serialize/deserialize pass and free the heap —
  *     on a cluster this is the "materialize the staging table"
  *     production shape);
  *   - candidates: each doc's BOTTOM-k sketch (k smallest md5₄₈ shingle
  *     hashes — order statistics of a uniform hash, so P(sketch hash of
  *     A lands in S(B)) ≈ C(A→B)) equi-joins the full posting list by
  *     hash; a df-cap drops ubiquitous boilerplate shingles first, so
  *     bucket occupancy is bounded and candidates per doc are
  *     ≤ sketchK·dfCap — scale-constant (the q33 budget rule);
  *   - exact verify: candidate pairs join BACK to the staged hash table
  *     on (doc, h) both sides — intersection counted by key, never by
  *     pairwise array work.
  *
  * Determinism: the operator is DEFINED over 48-bit md5 shingle hashes
  * (collisions are deterministic and replayed identically by the
  * oracle), so every emitted number is exact-integer-derived; the final
  * containment is one correctly-rounded division.
  */
object Containment {

  /** The distinct (doc_id, h) shingle-hash table — the staging unit the
    * whole family reads.
    */
  private def shingleTable(docs: DataFrame, idCol: String, textCol: String,
                           shingleK: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(textShingles(col(textCol), shingleK)).as("gram"))
      .select(col("doc_id"), md5Prefix48(col("gram")).as("h"))
      .distinct()

  /** `shingleTable` partitioned by hash(h) instead of the dedup key:
    * HashPartitioning(h) satisfies the ClusteredDistribution of every
    * h-keyed consumer (a groupBy(h), an equi-join on h, or on (h, x) —
    * h is a subset of each clustering), so when the result feeds those
    * consumers LAZILY (no checkpoint in between — `localCheckpoint`
    * records UnknownPartitioning and forfeits this), the frequency
    * aggregation and the posting joins plan with ZERO additional
    * exchanges (guide §2.4: establish the partitioning once). The dedup
    * is still complete — equal (doc_id, h) rows share h, hence a
    * partition — and loses no map-side reduction because textShingles
    * is per-doc distinct already. Measured at sf10 (r18): the delta
    * path of q92 dropped 6 exchanges and −41% wall; NOT used for the
    * checkpointed q83 staging, where the checkpoint erases the
    * partitioning and the h-only exchange costs extra (measured +20%).
    */
  private def shingleTableByH(docs: DataFrame, idCol: String,
                              textCol: String, shingleK: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(textShingles(col(textCol), shingleK)).as("gram"))
      .select(col("doc_id"), md5Prefix48(col("gram")).as("h"))
      .repartition(col("h"))
      .dropDuplicates("doc_id", "h")

  /** The distinct (doc_id, h) shingle-hash table, exposed for callers
    * building BOTH index faces of one corpus: stage THIS once (q92's
    * round-13 shape called dfIndex and postingIndex back to back, each
    * re-running the full explode + md5 + distinct shuffle of the old
    * corpus — the staging setup cost was paid twice) and derive the
    * faces with `dfIndexFrom`/`postingIndexFrom`.
    */
  def shingles(docs: DataFrame, idCol: String, textCol: String,
               shingleK: Int = 5): DataFrame =
    shingleTable(docs, idCol, textCol, shingleK)

  /** The shingle table with each row's corpus document-frequency
    * attached in place: (doc_id, h, c) — BOTH index faces in ONE
    * h-keyed pass (guide §2.4). The count-over-window needs exactly the
    * hash(h) clustering `shingleTableByH` establishes, so the whole
    * staging is one exchange + one sort; the df face is then a
    * dedup-by-h projection and the df-capped posting face a plain
    * filter — versus the agg+join derivation, which pays a groupBy(h)
    * exchange AND an h-keyed join over the staged table. Callers that
    * checkpoint should checkpoint THIS (one materialization instead of
    * three: sf10 receipt in OPTIMIZATION_r18.md, q92).
    */
  def shinglesWithDf(docs: DataFrame, idCol: String, textCol: String,
                     shingleK: Int = 5): DataFrame =
    shingleTableByH(docs, idCol, textCol, shingleK)
      .withColumn("c", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))

  /** The df-capped posting index (h, doc_b) — the static side the
    * streaming ingest face (C15) probes: ubiquitous boilerplate
    * shingles (df > dfCap) are dropped FIRST, so any single probe hash
    * returns ≤ dfCap candidates and per-doc candidate budgets stay
    * scale-constant. At 100 TB this is a batch-maintained table
    * (rebuilt with the corpus, like C14's seen-index).
    */
  def postingIndex(docs: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 5, dfCap: Int = 32): DataFrame =
    // window form (round 18): the df count rides the staging exchange,
    // so the cap is a filter — no groupBy(h) exchange + h-keyed join
    shinglesWithDf(docs, idCol, textCol, shingleK)
      .filter(col("c") <= dfCap)
      .select(col("h"), col("doc_id").as("doc_b"))

  /** Posting index derived from an already-staged shingle table and its
    * df face (one shuffle instead of re-shingling the corpus).
    */
  def postingIndexFrom(shd: DataFrame, dfreq: DataFrame,
                       dfCap: Int = 32): DataFrame =
    shd.join(dfreq.filter(col("c") <= dfCap).select("h"), Seq("h"))
      .select(col("h"), col("doc_id").as("doc_b"))

  /** The document-frequency side of the posting index: (h, c) — one row
    * per distinct shingle hash with its corpus df. Together with
    * `postingIndex` this is the FULL index state: the posting table
    * alone cannot be maintained incrementally because a retired bucket
    * (df > dfCap) erases the very count that decides whether future
    * rows under that hash belong.
    */
  def dfIndex(docs: DataFrame, idCol: String, textCol: String,
              shingleK: Int = 5): DataFrame =
    dfIndexFrom(shingleTable(docs, idCol, textCol, shingleK))

  /** df face from an already-staged shingle table. */
  def dfIndexFrom(shd: DataFrame): DataFrame =
    shd.groupBy(col("h")).agg(count(lit(1)).as("c"))

  /** ONE incremental maintenance step of the df-capped posting index
    * (the round-10 "make the streaming indexes live" task): given the
    * existing index state (`oldDf` = (h, c) document frequencies,
    * `oldPosting` = (h, doc_b) df-capped postings) and a batch of NEW
    * documents, returns the three deltas that bring the state up to
    * date:
    *   - `dfUpserts`  (h, c): the new TOTAL count for every hash the
    *     batch touches (upsert rows for the df table);
    *   - `postInserts` (h, doc_b): batch postings under hashes whose
    *     new df is still ≤ dfCap;
    *   - `postDeletes` (h, doc_b): the existing rows of buckets the
    *     batch pushed PAST the cap — retiring a bucket the moment a
    *     shingle becomes boilerplate is exactly what the batch rebuild
    *     does by dropping df>cap hashes first.
    *
    * Invariant (spec-pinned, and the q92 oracle replays it): applying
    * the deltas to the old state equals `postingIndex`/`dfIndex` of the
    * union corpus. Work per batch: the batch is shingled once
    * (scan-local), and the OLD state is touched only through keyed
    * equi-joins on the batch's hash set — never rescanned. At 100 TB
    * the old tables are merge-on-read catalog tables (bucketed by their
    * pk after OPTIMIZE, so these joins are exchange-free on the index
    * side) and a micro-batch costs O(|batch shingles| · bucket
    * occupancy).
    *
    * CONTRACT: batch doc_ids must be NEW to the corpus (the append-only
    * ingest reality; C14's exact dedup runs upstream of this operator,
    * so a replayed document never reaches it twice). A re-ingested
    * doc_id would double-count df — decrements are a compaction-time
    * concern, not an ingest-edge one.
    */
  def postingDelta(oldDf: DataFrame, oldPosting: DataFrame,
                   batch: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 5, dfCap: Int = 32)
      : (DataFrame, DataFrame, DataFrame) = {
    // h-partitioned staging: the batch shingle table feeds ONLY h-keyed
    // consumers (the bcnt aggregation and the insert join), so the
    // hash(h) exchange established here is the last one the batch side
    // pays (guide §2.4; sf10 receipt in OPTIMIZATION_r18.md)
    val bsh = shingleTableByH(batch, idCol, textCol, shingleK)
    val bcnt = bsh.groupBy(col("h")).agg(count(lit(1)).as("bc"))
    val joined = bcnt
      .join(oldDf.select(col("h"), col("c").as("oc")), Seq("h"), "left_outer")
      .select(col("h"), coalesce(col("oc"), lit(0L)).as("oc"),
        (coalesce(col("oc"), lit(0L)) + col("bc")).as("c"))
    val dfUpserts = joined.select(col("h"), col("c"))
    val crossed = joined
      .filter(col("oc") <= dfCap && col("c") > dfCap).select(col("h"))
    val postDeletes = oldPosting.join(crossed, Seq("h"))
      .select(col("h"), col("doc_b"))
    val postInserts = bsh
      .join(joined.filter(col("c") <= dfCap).select(col("h")), Seq("h"))
      .select(col("h"), col("doc_id").as("doc_b"))
    (dfUpserts, postInserts, postDeletes)
  }

  /** Bottom-k containment sketch computed IN THE ROW (for the streaming
    * ingest face, where a per-doc groupBy would be needless state): the
    * k smallest distinct md5₄₈ shingle hashes via one sorted-array
    * dedup fold — exactly the batch operator's per-doc topKPairs
    * result (StreamingSpec pins the two formulations equal). The fold
    * is sequential over ~|shingles| longs — scan-local, no aggregation
    * state.
    */
  def bottomKSketch(text: Column, shingleK: Int = 5,
                    sketchK: Int = 16): Column = {
    val sorted = array_sort(
      transform(textShingles(text, shingleK), g => md5Prefix48(g)))
    aggregate(sorted, array().cast("array<long>"),
      (acc, x) => when(size(acc) < sketchK &&
          (size(acc) === 0 || get(acc, size(acc) - 1) =!= x),
        concat(acc, array(x))).otherwise(acc))
  }

  /** Ordered containment pairs C(doc_a→doc_b) ≥ `threshold`, doc_a the
    * contained (smaller-set) side. Output:
    * (doc_a, doc_b, n_a, inter, containment).
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       shingleK: Int = 5, sketchK: Int = 16,
                       dfCap: Int = 32, minMatch: Int = 8,
                       threshold: Double = 0.8): DataFrame = {
    // staged WITH the df count attached (count-over-window in the same
    // h-keyed staging pass): the posting face becomes a filter of the
    // checkpoint instead of a groupBy(h) exchange + h-keyed join over
    // it. Round 17 rejected this form on sf0.1 telemetry, where AQE
    // answers the df-cap join with a broadcast; at the decades the df
    // table is corpus-sized and the join was a real two-sided SMJ —
    // sf10 receipt in OPTIMIZATION_r18.md.
    val shdC = shinglesWithDf(docs, idCol, textCol, shingleK)
      .localCheckpoint(true, StorageLevel.DISK_ONLY)
    val shd = shdC.select(col("doc_id"), col("h"))
    val sizes = shd.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // bottom-k sketch per doc: the KMV pattern — partial top-k on -h
    val bk = shd
      .groupBy(col("doc_id"))
      .agg(topKPairs((-col("h")).cast("double"), col("h"), sketchK).as("top"))
      .select(col("doc_id").as("doc_a"), explode(col("top.id")).as("h"))
    // posting list with the ubiquitous-shingle cap
    val post = shdC.filter(col("c") <= dfCap)
      .select(col("h"), col("doc_id").as("doc_b"))
    val cand = bk.join(post, Seq("h"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("m"))
      .filter(col("m") >= minMatch)
      .select(col("doc_a"), col("doc_b"))
    // exact intersection by (doc, h) key joins — never pairwise arrays
    val inter = cand
      .join(shd.select(col("doc_id").as("doc_a"), col("h")), Seq("doc_a"))
      .join(shd.select(col("doc_id").as("doc_b"), col("h")), Seq("doc_b", "h"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .withColumn("containment", col("inter").cast("double") / col("n_a"))
      .filter(col("containment") >= lit(threshold) &&
        (col("n_a") < col("n_b") ||
          (col("n_a") === col("n_b") && col("doc_a") < col("doc_b"))))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("inter"),
        col("containment"))
  }
}
