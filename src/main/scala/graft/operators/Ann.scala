package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Reusable approximate-nearest-neighbor operators over quantized
  * embeddings (SURVEY.md §2.D6/D7/D7b). All take a corpus DataFrame with
  * columns (`id`, `qv`) where qv = GraftFunctions.quantize(embedding);
  * the oracled queries q35/q36/q43 are thin wrappers.
  *
  * Scale contract: the corpus is never self-joined without a key —
  * brute force broadcasts the (small) query batch over one corpus scan;
  * LSH and IVF generate candidates through band/cell equi-joins.
  */
object Ann {

  private def cos(qa: Column, qb: Column, da: Column, db: Column): Column =
    quantDot(qa, qb).cast("double") / sqrt(da * db)

  private def withSelfDot(df: DataFrame): DataFrame =
    df.withColumn("selfdot", quantDot(col("qv"), col("qv")).cast("double"))

  /** Exact top-k per query by cosine: broadcast query batch × one corpus
    * scan; per-query top-k via window. The baseline every approximate
    * path is measured against.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     k: Int = 10): DataFrame = {
    val c = withSelfDot(corpus)
    val q = withSelfDot(queries)
      .select(col("id").as("q_id"), col("qv").as("q_qv"),
        col("selfdot").as("q_dot"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("c").desc, col("id"))
    c.join(broadcast(q), col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"),
        cos(col("q_qv"), col("qv"), col("q_dot"), col("selfdot")).as("c"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("id").as("neighbor"), col("c").as("cos_sim"),
        col("rn").cast("int").as("rn"))
  }

  /** Candidate near-neighbor pairs via hyperplane LSH: `planes`-bit
    * Rademacher signature, banded into `bands` keys; pairs sharing a
    * band verify with exact cosine ≥ `threshold`.
    */
  def lshPairs(corpus: DataFrame, planes: Int = 16, bands: Int = 4,
               threshold: Double = 0.3): DataFrame = {
    val bits = planes / bands
    val mask = (1L << bits) - 1
    // self-dots precomputed per row: the in-bucket verify then costs ONE
    // native dot per candidate pair (same doubles as quantCosine)
    val embs = withSelfDot(corpus.select(col("id").as("vec_id"), col("qv")))
      .withColumn("sig", hyperplaneSig(col("qv"), planes))
    val banded = embs.select(col("vec_id"), col("qv"), col("selfdot"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), shiftrightunsigned(col("sig"), bits * b)
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

  /** IVF: assign every vector to its nearest codebook centroid (broadcast
    * codebook, one corpus pass), probe the `nprobe` nearest cells per
    * query, exact re-rank inside the probed cells.
    */
  def ivfTopK(corpus: DataFrame, queryFilter: Column, centroidFilter: Column,
              nprobe: Int = 4, k: Int = 10): DataFrame = {
    val embs = withSelfDot(corpus).withColumnRenamed("id", "vec_id")
    val cents = embs.filter(centroidFilter)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"),
        col("selfdot").as("c_dot"))
    val scored = embs.join(broadcast(cents), lit(true))
      .withColumn("c_cos", cos(col("qv"), col("c_qv"), col("selfdot"), col("c_dot")))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("c_id"))
    val assign = scored
      .withColumn("crn", row_number().over(wAssign))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("qv"), col("selfdot"), col("c_id").as("cell"))
    val probes = scored.filter(queryFilter)
      .withColumn("prn", row_number().over(wAssign))
      .filter(col("prn") <= nprobe)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
        col("selfdot").as("q_dot"), col("c_id").as("cell"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("neighbor"))
    probes.join(assign, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor"),
        cos(col("q_qv"), col("qv"), col("q_dot"), col("selfdot")).as("cos_sim"))
      .distinct()
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("neighbor"), col("cos_sim"),
        col("rn").cast("int").as("rn"))
  }
}
