package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorExprsSpec extends SparkSpec {

  test("DotProduct matches the interpreted aggregate/zip_with fold bit-for-bit") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (Array(1.5, -2.25, 3.125), Array(0.5, 4.0, -1.0)),
      (Array(0.1, 0.2, 0.3), Array(0.3, 0.2, 0.1))
    ).toDF("a", "b")
    val interpreted = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0),
        (acc, v) => acc + v)).collect().map(_.getDouble(0))
    val native = df.select(VectorExprs.dotProduct($"a", $"b"))
      .collect().map(_.getDouble(0))
    assert(native.toSeq === interpreted.toSeq)
  }

  test("DotProduct casts float arrays and propagates null inputs") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (null, Array(1.0f, 1.0f))
    ).toDF("a", "b")
    val out = df.select(VectorExprs.dotProduct($"a", $"b")).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
  }

  test("DotProduct survives both codegen and interpreted paths") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((Array(2.0, 3.0), Array(5.0, 7.0))).toDF("a", "b")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val a = df.select(VectorExprs.dotProduct($"a", $"b")).head.getDouble(0)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val b = df.select(VectorExprs.dotProduct($"a", $"b")).head.getDouble(0)
      assert(a === 31.0 && b === 31.0)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
