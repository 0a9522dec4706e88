package graft

import graft.util.Tables
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The native decimal_dot Expression must be bit-identical to the
  * higher-order aggregate(zip_with(...)) recipe it replaces — on the real
  * embeddings table (codegen path) and on crafted edge cases including
  * null arrays and null elements (interpreted path too). */
class DecimalDotSpec extends SparkSpec {

  private val hof = graft.queries.VectorQueries.dotExprHof("a", "b")

  private val hofDouble =
    "CAST(aggregate(zip_with(a, b, (x, y) -> " +
      "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), " +
      "(acc, v) -> acc + v) AS DOUBLE)"

  test("decimal_dot and double_dot == HOF recipes bit-for-bit on the embeddings corpus") {
    val e = Tables.embeddings(spark, sf)
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("b")))
      .filter(col("ia") < col("ib")).limit(2000)
    val diff = pairs
      .select(expr("decimal_dot(a, b)").as("nat"), expr(hof).as("ref"),
        expr("double_dot(a, b)").as("natd"), expr(hofDouble).as("refd"))
      .filter(col("nat") =!= col("ref") || col("nat").isNull =!= col("ref").isNull
        || col("natd") =!= col("refd") || col("natd").isNull =!= col("refd").isNull)
    assert(diff.count() == 0)
  }

  test("decimal_dot and double_dot accept double arrays and mixed float/double (trained centroids)") {
    val e = Tables.embeddings(spark, sf)
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("af"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("bf")))
      .filter(col("ia") < col("ib")).limit(500)
      // widening float->double is value-preserving, so the double-array and
      // mixed forms must equal the all-float form bit-for-bit
      .withColumn("ad", transform(col("af"), _.cast("double")))
      .withColumn("bd", transform(col("bf"), _.cast("double")))
    val diff = pairs.select(
      expr("decimal_dot(af, bf)").as("ff"), expr("decimal_dot(ad, bd)").as("dd"),
      expr("decimal_dot(af, bd)").as("fd"),
      expr("double_dot(af, bf)").as("pff"), expr("double_dot(ad, bd)").as("pdd"))
      .filter(col("ff") =!= col("dd") || col("ff") =!= col("fd")
        || col("pff") =!= col("pdd"))
    assert(diff.count() == 0)
  }

  test("quantize8 equals the BigDecimal reference on boundary and random values") {
    def ref(p: Double): Long = java.math.BigDecimal.valueOf(p)
      .setScale(8, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact()
    val cases = Seq(0.0, -0.0, 5e-9, -5e-9, 1.5e-8, -1.5e-8, 2.5e-8, -2.5e-8,
      1.234567895, -1.234567895, 123.456, -987.654321, 0.1 * 0.3,
      4.4e7, -4.4e7, 9.9e6 + 5e-9)
    for (p <- cases)
      assert(graft.functions.DecimalDot.quantize8(p) == ref(p), s"case $p")
    val rnd = new scala.util.Random(42)
    (1 to 200000).foreach { _ =>
      val p = (rnd.nextDouble() - 0.5) * 50 // embedding-dot magnitude range
      assert(graft.functions.DecimalDot.quantize8(p) == ref(p), s"random $p")
    }
  }

  test("decimal_dot null semantics match the HOF fold") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Row(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),      // plain
      Row(Seq(1.0f, null), Seq(3.0f, 4.0f)),       // null element -> null
      Row(null, Seq(3.0f, 4.0f)),                  // null array -> null
      Row(Seq.empty[Float], Seq.empty[Float]))     // empty -> 0.0
    val df = spark.createDataFrame(rows.asJava, schema)
    val got = df.select(expr("decimal_dot(a, b)").as("nat"), expr(hof).as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), r.toString)
    }
    assert(got(0).getDouble(0) == 11.0)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
    assert(got(3).getDouble(0) == 0.0)
  }
}
