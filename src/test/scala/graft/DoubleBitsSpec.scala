package graft

import graft.functions.DoubleBits
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._

/** The ordering contract underneath the bit-prefix bucketing
  * (ops.Quantiles.exactNtile, ops.Corpus.tokenBudgetBy): the sortable
  * transform of double_bits must order EXACTLY like the doubles
  * themselves, with SQL-equal zeros colliding and canonical NaN landing
  * past +Inf. A violation here silently mis-tiles rows, so the law gets
  * its own spec independent of the operators that rely on it. */
class DoubleBitsSpec extends SparkSpec {

  private def samples: Seq[Double] = {
    val rnd = new scala.util.Random(1234)
    val specials = Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, Double.MinValue, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NaN, 1e-300, -1e-300, 1e300, -1e300)
    val rand = (1 to 2000).map { _ =>
      val m = rnd.nextDouble() * 2 - 1
      val e = rnd.nextInt(60) - 30
      m * math.pow(10, e)
    }
    specials ++ rand ++ rand.map(-_)
  }

  test("expression equals Double.doubleToLongBits on both eval paths") {
    // interpreted path: direct eval of the expression node
    for (d <- samples.take(50))
      assert(DoubleBits(Literal(d)).eval(null) ==
        java.lang.Double.doubleToLongBits(d))
    assert(DoubleBits(Literal(null, org.apache.spark.sql.types.DoubleType))
      .eval(null) == null)
    // codegen path: through a projection over a real frame
    import spark.implicits._
    val got = samples.toDF("v").select(col("v"), expr("double_bits(v)").as("b"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) == java.lang.Double.doubleToLongBits(r.getDouble(0)))
    }
  }

  test("the sortable transform is monotone over the whole double line, zeros collide, NaN last") {
    import spark.implicits._
    val df = samples.toDF("v")
      .withColumn("nb", expr("double_bits(v + 0.0D)"))
      .withColumn("t", when(col("nb") < 0,
        col("nb").bitwiseXOR(lit(Long.MaxValue))).otherwise(col("nb")))
    val rows = df.select("v", "t").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    for (Seq((v1, t1), (v2, t2)) <- rows.sortBy(_._1).toSeq.sliding(2)) {
      if (v1 < v2) assert(t1 < t2, s"order broken: $v1 -> $t1, $v2 -> $t2")
      if (v1 == v2) assert(t1 == t2, s"equal values split: $v1 -> $t1 vs $t2")
    }
    // scala sort puts NaN last (like Spark ASC); its transform must
    // exceed every real number's, +Inf included
    val nanT = rows.find(_._1.isNaN).get._2
    assert(rows.filter(!_._1.isNaN).forall(_._2 < nanT))
    // SQL-equal zeros share a transform (the +0.0 normalization)
    val zs = rows.filter(r => r._1 == 0.0).map(_._2).distinct
    assert(zs.size == 1)
  }
}
