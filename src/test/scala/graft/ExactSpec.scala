package graft

import graft.util.Exact
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the exact-aggregate kernel: partition-order
  * invariance (the core claim) and agreement with a BigDecimal reference.
  * (Plain scalacheck generators with a fixed seed — the scalatest bridge
  * artifact isn't among the vendored test deps.)
  */
class ExactSpec extends SparkSpec {

  test("exactSum is invariant under repartitioning") {
    import spark.implicits._
    val vals = (1 to 5000).map(i => (i % 7, i * 1.000001 + 0.123456789))
    val df = vals.toDF("k", "v")
    val a = df.repartition(1).groupBy("k").agg(Exact.exactSum(col("v")).as("s"))
      .orderBy("k").collect().map(_.getDouble(1)).toSeq
    val b = df.repartition(32).groupBy("k").agg(Exact.exactSum(col("v")).as("s"))
      .orderBy("k").collect().map(_.getDouble(1)).toSeq
    assert(a == b) // bit-identical, not approximately equal
  }

  test("exactStddevSamp matches BigDecimal reference on random data") {
    import spark.implicits._
    val gen = Gen.listOfN(50, Gen.choose(-1e4, 1e4))
    (1 to 10).foreach { i =>
      val xs = gen.apply(Gen.Parameters.default, Seed(42L + i)).get
        .map(x => math.rint(x * 100) / 100) // 2dp-ish values
      val df = xs.map(Tuple1(_)).toDF("v")
      val got = df.agg(Exact.exactStddevSamp(col("v"))).head().getDouble(0)
      val n = xs.size.toDouble
      val s = xs.map(BigDecimal(_).setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum
      val sq = xs.map(x => (BigDecimal(x) * BigDecimal(x))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      val expect = math.sqrt(math.max(0.0,
        (sq.toDouble - s.toDouble * s.toDouble / n) / (n - 1.0)))
      assert(math.abs(got - expect) <= math.ulp(expect) * 4, s"iteration $i")
    }
  }

  test("exactStddevSamp returns null for n < 2 (DuckDB semantics)") {
    import spark.implicits._
    val df = Seq(1.5).toDF("v")
    assert(df.agg(Exact.exactStddevSamp(col("v"))).head().isNullAt(0))
  }
}
