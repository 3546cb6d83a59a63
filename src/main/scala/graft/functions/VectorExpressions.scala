package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, CodegenFallback}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge.{column, expression}

/** Native Catalyst expressions for the hot inner loops of the pipeline
  * operators. Spark's higher-order functions (`aggregate`/`zip_with`)
  * interpret their lambdas per element — fine for metadata-sized data,
  * ~100× too slow for O(n²·d) similarity kernels at bench scale. These
  * expressions run tight JVM loops (dot product additionally generates
  * code), preserving the exact summation order of the HOF formulations so
  * oracle-checked results are unchanged.
  */

/** Σ aᵢ·bᵢ over two ARRAY<DOUBLE> columns (sequential order). */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
        right.dataType.isInstanceOf[ArrayType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("dot_product expects array<double> inputs")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash from an ARRAY<LONG> of token hashes: per bit position,
  * sum ±1 across tokens; bit i set where the sum is positive.
  */
case class SimhashExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val sums = new Array[Int](64)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (sums(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimhashExpr =
    copy(child = c)
}

/** MinHash signature from an ARRAY<LONG> of shingle hashes:
  * out[j] = min over x of (pmod(x,p)*a_j + b_j) mod p. Empty input →
  * all-p sentinel signature (matches the HOF fold's initial accumulator).
  */
case class MinhashSignatureExpr(child: Expression, coeffA: Seq[Long],
                                coeffB: Seq[Long], prime: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val k = coeffA.size
    val out = Array.fill(k)(prime)
    val a = coeffA.toArray
    val b = coeffB.toArray
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val x = hs.getLong(i)
      val xm = ((x % prime) + prime) % prime // pmod of signed hash
      var j = 0
      while (j < k) {
        val h = (xm * a(j) + b(j)) % prime
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MinhashSignatureExpr =
    copy(child = c)
}

object VectorFunctions {
  /** Codegen'd Σ aᵢ·bᵢ. */
  def dot_product(a: Column, b: Column): Column =
    column(DotProductExpr(expression(a), expression(b)))

  def simhash64(tokenHashes: Column): Column =
    column(SimhashExpr(expression(tokenHashes)))

  def minhash_signature(shingleHashes: Column, coeffs: Seq[(Long, Long)],
                        prime: Long): Column =
    column(MinhashSignatureExpr(expression(shingleHashes),
      coeffs.map(_._1), coeffs.map(_._2), prime))

}
