package graft.functions

import graft.SparkTestSession
import graft.operators.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TokenCountSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("native expression equals the functions-composed variant") {
    import spark.implicits._
    val df = Seq("", "  ", "one", " one  two\tthree\n", "а б в",
      "x".repeat(50) + " y").toDF("text")
    val rows = df.select(
      TokenCount.tokenCount(col("text")).as("native"),
      TextStats.tokenCount(col("text")).as("composed")).collect()
    for (r <- rows) assert(r.getInt(0) == r.getInt(1), r.toString)
  }

  test("null propagates; SQL registration works; codegen survives") {
    import spark.implicits._
    TokenCount.register(spark)
    val df = Seq(Some("a b c"), None).toDF("text")
    df.createOrReplaceTempView("tc_test")
    val got = spark.sql("SELECT token_count(text) FROM tc_test")
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).sorted
    assert(got.toSeq == Seq(-1, 3))
    // stays inside WholeStageCodegen (non-foldable input so the project
    // isn't collapsed into a LocalTableScan at planning time)
    val ranged = spark.range(10)
      .select(TokenCount.tokenCount(concat(lit("a b "), col("id"))).as("tc"))
    assert(ranged.collect().forall(_.getInt(0) == 3))
    // the "*(1)" prefix marks the WholeStageCodegen stage id
    assert(ranged.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }
}
