package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Product-quantization ANN (SURVEY.md §2.D7f; Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011) —
  * the memory-compression face of approximate search, complementing the
  * partition faces (IVF q43, LSH q36, two-level IVF q70): each vector is
  * stored as m small per-subspace codes (m·log2(ks) bits instead of
  * dim·64), and query distance is approximated from per-subspace
  * lookup tables (ADC — asymmetric distance computation), then a
  * bounded candidate set re-ranks exactly.
  *
  * At 10¹² vectors the uncompressed corpus (dim 64 × 8 B = 512 B/vec)
  * is ~0.5 PB; PQ codes at m=8, ks=16 are 4 B/vec — the difference
  * between "the scan reads the lake" and "the scan reads 4 TB". The
  * codebook is m·ks rows at ANY corpus size (fixed compression budget,
  * NOT a partition count — unlike IVF's k, ks must not grow with n:
  * encode cost n·m·ks and ADC cost n·m·q stay linear in n with ks
  * constant, so the adaptive-k lessons of q34/q43 do not apply here
  * and there is no clamp for a quadratic to hide behind).
  *
  * Scale shape: codebooks and LUTs broadcast (m·ks and q·m·ks rows);
  * encoding is explode(m) → broadcast join → (id, sub)-keyed argmin
  * with map-side partials; ADC is codes ⋈ broadcast LUT → (q, id)-keyed
  * exact BIGINT sum; top-R reduces via the TopKPairs partial aggregate;
  * only the ≤ q·R re-rank rows ever join back to full vectors.
  *
  * Determinism: EVERYTHING is exact BIGINT arithmetic — squared L2 over
  * quantized vectors via d² = ⟨a,a⟩ + ⟨b,b⟩ − 2⟨a,b⟩ on the native
  * DotLong kernel, argmin tie-break (d², c_id), ADC sums of exact ints.
  * Unlike the cosine family there is NO floating-point op anywhere, so
  * the q80/q81 oracles replay with zero ulp risk.
  */
object Pq {

  private def sub(v: Column, s: Int, subDim: Int): Column =
    slice(v, s * subDim + 1, subDim)

  private def d2(dotAA: Column, dotBB: Column, dotAB: Column): Column =
    dotAA + dotBB - lit(2L) * dotAB

  /** Per-subspace codebook from the uniform modulo sample (the q34
    * rule: never a prefix). Output (sub, c_id, c_sv, c_self); m·(n/stride)
    * rows — broadcast-sized by construction.
    */
  def codebook(corpus: DataFrame, stride: Long, m: Int, subDim: Int): DataFrame =
    corpus.filter(col("id") % stride === 0)
      .select(col("id").as("c_id"),
        explode(array((0 until m).map { s =>
          struct(lit(s).as("sub"), sub(col("qv"), s, subDim).as("c_sv"))
        }: _*)).as("e"))
      .select(col("e.sub").as("sub"), col("c_id"), col("e.c_sv").as("c_sv"),
        quantDot(col("e.c_sv"), col("e.c_sv")).as("c_self"))

  /** PQ codes: nearest per-subspace centroid for every corpus vector.
    * Output (id, sub, code) — the m·log2(ks)-bit compressed corpus.
    */
  def encode(corpus: DataFrame, cb: DataFrame, m: Int, subDim: Int): DataFrame =
    corpus
      .select(col("id"),
        explode(array((0 until m).map { s =>
          struct(lit(s).as("sub"), sub(col("qv"), s, subDim).as("sv"))
        }: _*)).as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.sv").as("sv"),
        quantDot(col("e.sv"), col("e.sv")).as("self"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("id"), col("sub"),
        struct(d2(col("self"), col("c_self"), quantDot(col("sv"), col("c_sv")))
          .as("d2"), col("c_id")).as("cand"))
      .groupBy(col("id"), col("sub"))
      .agg(min(col("cand")).as("best"))
      .select(col("id"), col("sub"), col("best.c_id").as("code"))

  /** ADC top-k by squared L2: per-query per-subspace LUT against the
    * codebook, candidate distances summed from codes, top-`rerank` by
    * ADC through TopKPairs, exact re-rank of those candidates to top-k.
    * Output (q_id, rn, neighbor, dist2) — exact BIGINTs throughout.
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, stride: Long,
              m: Int = 8, subDim: Int = 8, k: Int = 10,
              rerank: Int = 50): DataFrame = {
    val cb = codebook(corpus, stride, m, subDim)
    val codes = encode(corpus, cb, m, subDim)
    // LUT: distance of each query subvector to each per-subspace centroid
    val lut = queries
      .select(col("id").as("q_id"),
        explode(array((0 until m).map { s =>
          struct(lit(s).as("sub"), sub(col("qv"), s, subDim).as("qsv"))
        }: _*)).as("e"))
      .select(col("q_id"), col("e.sub").as("sub"), col("e.qsv").as("qsv"),
        quantDot(col("e.qsv"), col("e.qsv")).as("qself"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("q_id"), col("sub").as("l_sub"), col("c_id").as("l_cid"),
        d2(col("qself"), col("c_self"), quantDot(col("qsv"), col("c_sv")))
          .as("d2q"))
    val adc = codes
      .join(broadcast(lut),
        col("sub") === col("l_sub") && col("code") === col("l_cid"))
      .filter(col("id") =!= col("q_id"))
      .groupBy(col("q_id"), col("id"))
      .agg(sum(col("d2q")).as("adc"))
    // top-R candidates per query: TopKPairs on the NEGATED distance
    // (its order is score desc, id asc ⇒ distance asc, id asc); adc
    // < 2^53 so the double cast is exact
    val cands = adc
      .groupBy(col("q_id"))
      .agg(topKPairs((-col("adc")).cast("double"), col("id"), rerank).as("top"))
      .select(col("q_id"), explode(col("top.id")).as("id"))
    // exact re-rank of ≤ q·R candidates — the only join back to vectors
    val qv = corpus.select(col("id"), col("qv"),
      quantDot(col("qv"), col("qv")).as("self"))
    val qq = queries.select(col("id").as("q_id"), col("qv").as("q_qv"),
      quantDot(col("qv"), col("qv")).as("q_self"))
    val exact = cands
      .join(qv, Seq("id"))
      .join(broadcast(qq), Seq("q_id"))
      .select(col("q_id"), col("id"),
        d2(col("q_self"), col("self"), quantDot(col("q_qv"), col("qv")))
          .as("dist2"))
    exact
      .groupBy(col("q_id"))
      .agg(topKPairs((-col("dist2")).cast("double"), col("id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rn"),
        col("col.id").as("neighbor"),
        (-col("col.score")).cast("long").as("dist2"))
  }

  /** Exact squared-L2 brute-force top-k — the ground truth the PQ path
    * is recall-audited against (q81): broadcast query batch × one
    * corpus scan, TopKPairs partial aggregate, all-BIGINT.
    */
  def bruteForceL2TopK(corpus: DataFrame, queries: DataFrame,
                       k: Int = 10): DataFrame = {
    val c = corpus.select(col("id"), col("qv"),
      quantDot(col("qv"), col("qv")).as("self"))
    val q = queries.select(col("id").as("q_id"), col("qv").as("q_qv"),
      quantDot(col("qv"), col("qv")).as("q_self"))
    c.join(broadcast(q), col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"),
        d2(col("q_self"), col("self"), quantDot(col("q_qv"), col("qv")))
          .as("dist2"))
      .groupBy(col("q_id"))
      .agg(topKPairs((-col("dist2")).cast("double"), col("id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rn"),
        col("col.id").as("neighbor"),
        (-col("col.score")).cast("long").as("dist2"))
  }
}
