package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

class VectorExpressionSpec extends SparkSuite {
  import spark.implicits._

  test("dot_f64 codegen path matches the composable aggregate form exactly") {
    VectorExpressions.register(spark)
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val both = df.select(
      expr("dot_f64(e, e)").as("native"),
      expr("aggregate(transform(e, x -> x * x), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
        .as("composed"))
    // bit-exact: identical summation order
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("dot_f64 handles nulls and known values") {
    VectorExpressions.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(expr("dot_f64(a, b)").as("d")).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0))
  }

  test("dot_f64 rejects non-double-array inputs at analysis") {
    VectorExpressions.register(spark)
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[Exception] { df.select(expr("dot_f64(a, b)")).collect() }
  }
}
