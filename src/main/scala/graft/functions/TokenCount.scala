package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace token counter with whole-stage codegen.
  *
  * Exactly `size(split(trim(c), "\\s+"))` with blank -> 0 (the
  * TextStats.tokenCount semantics), but as a single byte scan over the
  * UTF8String — no regex, no array materialization, no codegen break.
  * Java's \s is ASCII-only, so a byte-level scan is exact for UTF-8
  * (continuation bytes have the high bit set and can't be whitespace).
  *
  * This is the (b) tier of the custom-operator preference order
  * (SURVEY.md §7.2): a scalar `Expression` beats a UDF; nothing here
  * needs a full LogicalPlan/Strategy.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_count requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {

  /** Count of maximal non-\s byte runs. Static so generated code can
    * call it directly.
    */
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var n = 0
    var in = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' ||
        b == '\r'
      if (!ws && !in) { n += 1; in = true }
      else if (ws) in = false
      i += 1
    }
    n
  }

  /** Column surface. */
  def tokenCount(c: Column): Column =
    GraftShims.column(TokenCount(GraftShims.expression(c)))

  /** SQL surface: `SELECT token_count(text)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_count", exprs => TokenCount(exprs.head), "scala_udf")
}
