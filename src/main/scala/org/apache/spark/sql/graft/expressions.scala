package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.VectorOps

/** ArrayData-facing kernels called from both interpreted eval and the
  * generated code (one call site keeps the two paths bit-identical).
  */
object ExprKernels {
  def cosine(a: ArrayData, b: ArrayData): Double =
    VectorOps.cosineF(a.toFloatArray(), b.toFloatArray())

  def dot(a: ArrayData, b: ArrayData): Double =
    VectorOps.dotF(a.toFloatArray(), b.toFloatArray())

  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) = tokens.getUTF8String(i).getBytes
      i += 1
    }
    VectorOps.simhash64(bytes)
  }

  def fingerprint(s: UTF8String): Long = VectorOps.fingerprint(s.getBytes)
}

/** Native codegen cosine similarity over `array<float>` — the hot kernel
  * of the similarity/dedup family (SURVEY.md §2.E4). A Catalyst
  * Expression (not a UDF) so it stays inside whole-stage codegen: no
  * boxing, no Row conversion, one JIT-inlined static call per row.
  */
case class CosineSimilarityF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"org.apache.spark.sql.graft.ExprKernels.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityF =
    copy(left = newLeft, right = newRight)
}

/** Native codegen dot product over `array<float>`. */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"org.apache.spark.sql.graft.ExprKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash of a token array (SURVEY.md §2.D3). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(tokens: Any): Any =
    ExprKernels.simhash(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"org.apache.spark.sql.graft.ExprKernels.simhash($t)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Position-weighted rolling fingerprint of a document (SURVEY.md §2.D11).
  * Arithmetic mirrored exactly by the DuckDB oracle (see Pipeline.q42).
  */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"

  override protected def nullSafeEval(s: Any): Any =
    ExprKernels.fingerprint(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"org.apache.spark.sql.graft.ExprKernels.fingerprint($s)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}
