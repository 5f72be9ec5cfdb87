package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature with whole-stage codegen:
  * `sig[i] = min over shingles of xxhash64(shingle, i)` (the variadic
  * Spark hash: a fold from seed 42 through the arguments in order).
  *
  * Bit-identical to the HOF form it replaces
  * (`transform(sequence(0, n-1), i => coalesce(array_min(transform(sh,
  * s => xxhash64(s, i))), Long.MaxValue))`) because the per-element
  * hash IS Spark's own [[XxHash64Function]]: same XXH64, same seeds,
  * so LSH candidate recall is unchanged down to the exact hash values.
  * The null contract is replicated too: a null shingle ARRAY and an
  * empty one both yield the all-MaxValue signature (the HOF's
  * coalesce), and a null shingle ELEMENT leaves the seed fold
  * unchanged (Spark's hash-of-null rule) — though
  * [[graft.operators.Dedup.wordShingles]] never emits null elements.
  *
  * Why native: the HOF form is interpreted (no codegen for higher-order
  * functions), costing numHashes x |shingles| boxed closure dispatches
  * per document — the dominant per-row term of the q20/q45/q48 minhash
  * family. Here it is one primitive double loop.
  */
case class MinhashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<STRING> and numHashes > 0, got " +
        s"${dt.sql} / $numHashes")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  // a null shingle array means "no shingles": same all-MaxValue
  // signature as an empty one (the HOF form's coalesce), so eval
  // handles null itself instead of nullIntolerant short-circuiting
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    MinhashSig.compute(v.asInstanceOf[ArrayData], numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        ${CodeGenerator.javaType(dataType)} ${ev.value} =
          graft.functions.MinhashSig.compute(
            ${c.isNull} ? null : ${c.value}, $numHashes);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {

  /** One pass per shingle updating all seed minima; null/empty array ->
    * all MaxValue. Static so generated code calls it directly.
    *
    * Seed chain replicated from Spark's variadic `xxhash64(s, i)`: the
    * fold starts at the default seed 42 and hashes each argument into
    * the accumulator IN ORDER — `hashInt(i, hash(s, 42))` — so the
    * string is hashed ONCE per shingle and each of the numHashes seeds
    * costs only a constant-time int fold (the HOF form re-hashed the
    * full string numHashes times). Null shingles skip the fold (Spark's
    * hash-of-null rule leaves the seed unchanged).
    */
  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    if (shingles != null) {
      val n = shingles.numElements()
      var j = 0
      while (j < n) {
        val s = shingles.getUTF8String(j)
        val base =
          if (s == null) 42L
          else XxHash64Function.hash(s, StringType, 42L)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashInt(i, base)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
        j += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** Column surface. */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    GraftShims.column(MinhashSig(GraftShims.expression(shingles), numHashes))
}
