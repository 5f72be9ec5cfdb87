package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native array<double> dot product with whole-stage codegen.
  *
  * Exactly `aggregate(zip_with(a, b, (x, y) => x * y), 0d, _ + _)` over
  * double arrays — the same left-to-right IEEE summation order — but as
  * one primitive loop over `ArrayData`. Spark's higher-order functions
  * do NOT participate in codegen (each call is interpreted with boxed
  * closures, ~25 us per 64-dim cosine measured on the q77 pair filter);
  * this is the hot scalar of the whole similarity tier (brute-force
  * kNN, LSH verify, IVF assignment, SemDeDup), so it gets the (b)
  * custom-Expression treatment like [[TokenCount]].
  *
  * Semantics deltas vs the HOF form, both irrelevant to the embedding
  * contract and documented here: mismatched lengths sum over the
  * shorter prefix (the HOF nulls the whole result via zip_with's null
  * padding), and null ELEMENTS are undefined (embeddings are dense
  * non-null vectors; null arrays still null the result via
  * nullIntolerant).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Left-to-right product sum (static so generated code calls it). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Column surface; callers cast inputs to array<double> themselves
    * (see [[graft.operators.Similarity.dot]]).
    */
  def dotCol(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(
      GraftShims.expression(a), GraftShims.expression(b)))

  /** SQL surface: `SELECT dot_product(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
}
