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

  test("hyperplaneSig (native) == per-plane pmod(xxhash64) HOF formulation") {
    val dim = 64
    def sigBit(p: Int) = {
      val proj = aggregate(
        zip_with(col("qv"), sequence(lit(0), lit(dim - 1)),
          (x, i) => x * (pmod(xxhash64(lit(p), i), lit(2)) * lit(2L) - lit(1L))),
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
}
