package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._

/** The native codegen kernels (DotLong / MinHashSigE / HyperplaneSigE)
  * replaced interpreted higher-order-function formulations for speed —
  * these tests pin them bit-identical to the originals, which is what
  * keeps the DuckDB oracles (built against the HOF arithmetic) valid.
  */
class NativeExprSpec extends AnyFunSuite {
  import SparkFixture._

  test("minhashSig (native) == array_min(transform(xxhash64)) per permutation") {
    val docs = Tables.t(spark, sfDir, "documents").limit(50)
      .select(col("doc_id"), shingles(tokens(col("text")), 5).as("sh"))
      .filter(size(col("sh")) > 0)
    val hof = array((0 until MinhashPerms).map { i =>
      array_min(transform(col("sh"), s => xxhash64(lit(i), s)))
    }: _*)
    val diffs = docs.select(minhashSig(col("sh")).as("native"), hof.as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(diffs == 0)
  }

  test("textShingles (native) == array_distinct(transform(concat_ws(slice))) incl. order") {
    val docs = Tables.t(spark, sfDir, "documents").limit(200)
    for (k <- Seq(3, 5)) {
      val diffs = docs
        .select(textShingles(col("text"), k).as("native"),
          shingles(tokens(col("text")), k).as("ref"))
        .filter(col("native") =!= col("ref")).count()
      assert(diffs == 0, s"k=$k shingle mismatch")
    }
    // edge cases: consecutive/leading/trailing spaces, short texts
    val edge = spark.createDataFrame(Seq(
      Tuple1("a  b c"), Tuple1(" x y"), Tuple1("p q "), Tuple1("one two"),
      Tuple1(""), Tuple1("a a a a a a"))).toDF("text")
    val ediffs = edge
      .select(textShingles(col("text"), 3).as("native"),
        shingles(tokens(col("text")), 3).as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(ediffs == 0)
  }

  test("windowMd5s (native) == transform(sequence, unhex(md5(concat_ws(slice)))) incl. order") {
    def ref(k: Int) = {
      val toks = tokens(col("text"))
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - lit(k)),
          i => unhex(md5(concat_ws(" ", slice(toks, i + 1, lit(k)))
            .cast("binary")))))
        .otherwise(array().cast("array<binary>"))
    }
    val docs = Tables.t(spark, sfDir, "documents").limit(200)
    for (k <- Seq(5, 15)) {
      val diffs = docs
        .select(windowMd5s(col("text"), k).as("native"), ref(k).as("r"))
        .filter(col("native") =!= col("r")).count()
      assert(diffs == 0, s"k=$k window fingerprint mismatch")
    }
    // edge cases: consecutive/leading/trailing spaces, exact-k, sub-k
    val edge = spark.createDataFrame(Seq(
      Tuple1("a  b c"), Tuple1(" x y"), Tuple1("p q "), Tuple1("one two"),
      Tuple1(""), Tuple1("a a a"), Tuple1("a b"))).toDF("text")
    val ediffs = edge
      .select(windowMd5s(col("text"), 3).as("native"), ref(3).as("r"))
      .filter(col("native") =!= col("r")).count()
    assert(ediffs == 0)
  }

  test("textGramStats (native) == composed size/array_distinct/sorted-run fold") {
    def composed(k: Int) = {
      val toks = tokens(col("text"))
      val g = transform(sequence(lit(0), size(toks) - lit(k)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k))))
      val top = aggregate(
        array_sort(g),
        struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
            .otherwise(lit(1))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
      struct((size(toks) - lit(k) + lit(1)).as("n_grams"),
        size(array_distinct(g)).as("n_distinct"), top.as("max_freq"))
    }
    val docs = Tables.t(spark, sfDir, "documents").limit(200)
      .filter(size(tokens(col("text"))) >= 3)
    for (k <- Seq(2, 3)) {
      val diffs = docs
        .select(textGramStats(col("text"), k).as("native"),
          composed(k).as("ref"))
        .filter(col("native") =!= col("ref")).count()
      assert(diffs == 0, s"k=$k gram-stats mismatch")
    }
    // short/degenerate texts: below k tokens the kernel returns zeros
    val edge = spark.createDataFrame(Seq(
      Tuple1(""), Tuple1("solo"), Tuple1("a b"), Tuple1("a a a a"),
      Tuple1("x  y z"))).toDF("text")
    val zeros = edge.filter(size(tokens(col("text"))) < 3)
      .select(textGramStats(col("text"), 3).as("s"))
      .filter(col("s.n_grams") =!= 0 || col("s.n_distinct") =!= 0 ||
        col("s.max_freq") =!= 0).count()
    assert(zeros == 0)
    val ediffs = edge.filter(size(tokens(col("text"))) >= 3)
      .select(textGramStats(col("text"), 3).as("native"),
        composed(3).as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(ediffs == 0)
  }

  test("regexTokenCount (native) == size(regexp_extract_all)") {
    def ref = size(regexp_extract_all(col("text"),
      lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
    val docs = Tables.t(spark, sfDir, "documents").limit(300)
    val diffs = docs
      .select(regexTokenCount(col("text")).as("native"), ref.as("r"))
      .filter(col("native") =!= col("r")).count()
    assert(diffs == 0)
    // edge cases: empty, runs at boundaries, punctuation, digits,
    // multibyte UTF-8 (each non-matching code point = one match),
    // consecutive spaces
    val edge = spark.createDataFrame(Seq(
      Tuple1(""), Tuple1("   "), Tuple1("abc"), Tuple1("123"),
      Tuple1("a1b2"), Tuple1("hello, world! 42x"), Tuple1("héllo wörld"),
      Tuple1("a  b"), Tuple1("!!!"), Tuple1("ñ"), Tuple1("x9 9x"))).toDF("text")
    val ediffs = edge
      .select(regexTokenCount(col("text")).as("native"), ref.as("r"))
      .filter(col("native") =!= col("r")).count()
    assert(ediffs == 0)
  }

  test("minhashBandKeys (native) == bandKeys(minhashSig(sh))") {
    val docs = Tables.t(spark, sfDir, "documents").limit(50)
      .select(col("doc_id"), shingles(tokens(col("text")), 5).as("sh"))
      .filter(size(col("sh")) > 0)
    val diffs = docs
      .select(minhashBandKeys(col("sh")).as("native"),
        bandKeys(minhashSig(col("sh"))).as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(diffs == 0)
  }

  test("quantDot (native) == aggregate(zip_with(*)) over quantized vectors") {
    val e = Tables.t(spark, sfDir, "embeddings").limit(100)
      .select(quantize(col("embedding")).as("qv"))
    val hof = aggregate(zip_with(col("qv"), col("qv"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val diffs = e.select(quantDot(col("qv"), col("qv")).as("native"), hof.as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(diffs == 0)
  }

  test("topKPairs (native agg) == row_number window top-k incl. tie-break") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.t(spark, sfDir, "embeddings").limit(200)
      .select(col("vec_id").as("id"), quantize(col("embedding")).as("qv"))
    val q = e.filter(col("id") < 5)
      .select(col("id").as("q_id"), col("qv").as("q_qv"))
    val scored = e.join(q, col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"),
        quantCosine(col("q_qv"), col("qv")).as("c"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("c").desc, col("id"))
    val ref = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 7)
      .select(col("q_id"), col("id").as("neighbor"), col("c").as("cos_sim"),
        col("rn").cast("int").as("rn"))
    val native = scored.groupBy(col("q_id"))
      .agg(topKPairs(col("c"), col("id"), 7).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col.id").as("neighbor"),
        col("col.score").as("cos_sim"), (col("pos") + 1).cast("int").as("rn"))
    assert(native.count() == ref.count())
    assert(native.except(ref).isEmpty && ref.except(native).isEmpty)
  }

  test("nearestCentroid/nearestCells (native) == row_number window argmax") {
    import org.apache.spark.sql.expressions.Window
    val embs = Tables.t(spark, sfDir, "embeddings").limit(300)
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("selfdot", quantDot(col("qv"), col("qv")).cast("double"))
    val cents = embs.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("qv").as("c_qv"),
        col("selfdot").as("c_dot"))
    val cb = broadcast(cents.agg(sort_array(collect_list(
      struct(col("c_id"), col("c_qv"), col("c_dot")))).as("cb")))
    val native = embs.crossJoin(cb)
      .select(col("vec_id"),
        nearestCentroid(col("qv"), col("selfdot"), col("cb")).as("cell"),
        nearestCells(col("qv"), col("selfdot"), col("cb"), 4).as("cells"))
    val scored = embs.crossJoin(cents)
      .select(col("vec_id"), col("c_id"),
        (quantDot(col("qv"), col("c_qv")).cast("double") /
          sqrt(col("selfdot") * col("c_dot"))).as("c_cos"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("c_cos").desc, col("c_id"))
    val ref = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4)
      .groupBy(col("vec_id"))
      .agg(transform(sort_array(collect_list(struct(col("rn"), col("c_id")))),
        x => x("c_id")).as("ref_cells"))
    val diffs = native.join(ref, "vec_id")
      .filter(col("cells") =!= col("ref_cells") ||
        col("cell") =!= element_at(col("ref_cells"), 1))
      .count()
    assert(diffs == 0)
  }

  test("hyperplaneSig (native) == per-plane md5-nibble-parity HOF formulation") {
    val dim = 64
    // sign(p, d) = parity of the first hex nibble of md5("p:d") — the
    // exact formulation the DuckDB oracle replays for q36
    def sigBit(p: Int) = {
      val proj = aggregate(
        zip_with(col("qv"), sequence(lit(0), lit(dim - 1)),
          (x, i) => x * (conv(substring(md5(
              concat_ws(":", lit(p).cast("string"), i.cast("string"))
                .cast("binary")), 1, 1), 16, 10)
            .cast("long") % 2 * lit(2L) - lit(1L))),
        lit(0L), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    val e = Tables.t(spark, sfDir, "embeddings").limit(100)
      .select(quantize(col("embedding")).as("qv"))
    val hof = (0 until 16).map(sigBit).reduce(_ + _)
    val diffs = e.select(hyperplaneSig(col("qv")).as("native"), hof.as("ref"))
      .filter(col("native") =!= col("ref")).count()
    assert(diffs == 0)
  }

  test("pqCodes (native) == declarative min(struct(d2, c_id)) argmin per subspace") {
    import org.apache.spark.sql.expressions.Window
    val (m, subDim) = (8, 8)
    val embs = Tables.t(spark, sfDir, "embeddings").limit(300)
      .select(col("vec_id").as("id"), quantize(col("embedding")).as("qv"))
    val cb = graft.operators.Pq.codebook(embs, stride = 16, m, subDim)
    val ks = cb.filter(col("sub") === 0).count().toInt
    // declarative reference: the old explode -> broadcast join -> keyed
    // argmin encode, spelled inline (code = winning centroid's c_id)
    def subv(v: org.apache.spark.sql.Column, s: Int) =
      slice(v, s * subDim + 1, subDim)
    val exploded = embs.select(col("id"),
      explode(array((0 until m).map { s =>
        struct(lit(s).as("sub"), subv(col("qv"), s).as("sv"))
      }: _*)).as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.sv").as("sv"),
        quantDot(col("e.sv"), col("e.sv")).as("self"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("id"), col("sub"),
        struct((col("self") + col("c_self") -
          lit(2L) * quantDot(col("sv"), col("c_sv"))).as("d2"),
          col("c_id")).as("cand"))
      .groupBy(col("id"), col("sub"))
      .agg(min(col("cand")).as("best"))
      .select(col("id"), col("sub"), col("best.c_id").as("ref_code"))
    val native = graft.operators.Pq.encode(embs, cb, m, subDim)
    val diffs = native.join(exploded, Seq("id", "sub"))
      .filter(col("code") =!= col("ref_code")).count()
    assert(diffs == 0)
    assert(native.count() == 300L * m)
    assert(ks >= 16, s"codebook should have >= 16 centroids/sub, got $ks")
  }
}
