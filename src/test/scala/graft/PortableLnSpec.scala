package graft

import graft.util.Portable
import org.apache.spark.sql.functions._

/** Laws of the portable natural log (util.Portable.pln) — the primitive
  * under every log-weighted corpus score (TF-IDF, BM25, PMI). The point
  * of pln is ENGINE determinism (only correctly-rounded IEEE ops in a
  * fixed order — the oracle gate proves the cross-engine half on every
  * run); these specs pin the numeric envelope against the JVM's own ln
  * so the approximation can never silently degrade.
  */
class PortableLnSpec extends SparkSpec {

  private def plnOf(xs: Seq[Double]): Seq[Double] = {
    import spark.implicits._
    Portable.pln(xs.toDF("x"), col("x"), "y").select("y")
      .collect().map(_.getDouble(0)).toSeq
  }

  test("pln matches Math.log within 1e-12 relative across the score domain") {
    val ratios = for (n <- Seq(100L, 1000L, 60000L, 1000000L); df <- 1L to 50L)
      yield (n + 1.0) / (df + 1.0)
    val bm25ish = for (n <- Seq(500L, 60000L); df <- 1L to 50L)
      yield 1.0 + ((n - df) + 0.5) / (df + 0.5)
    val unit = (1 until 2000 by 7).map(_ / 1999.0)
    val edges = Seq(1.0, 2.0, 0.5, 4.0, 1.5, 1e-6, 1e-12, 1e12,
      Math.nextUp(1.0), Math.nextDown(1.0), Math.nextUp(2.0), Math.nextDown(2.0),
      Math.nextUp(4.0), Math.nextDown(0.5))
    val xs = ratios ++ bm25ish ++ unit ++ edges
    val got = plnOf(xs)
    xs.zip(got).foreach { case (x, y) =>
      val want = Math.log(x)
      val tol = 1e-12 * math.max(1.0, math.abs(want))
      assert(math.abs(y - want) <= tol, s"pln($x) = $y vs ln = $want")
    }
  }

  test("pln is exact where the recipe is closed-form") {
    // x = 1: k = 0, t = 0 -> exactly 0.  x = 2^k: m = 1 -> exactly k * Ln2
    // (the one double multiply the recipe performs).
    val xs = Seq(1.0, 2.0, 8.0, 1024.0, 0.25, math.pow(2.0, -20))
    val got = plnOf(xs)
    assert(got(0) == 0.0)
    assert(got(1) == Portable.Ln2)
    assert(got(2) == 3.0 * Portable.Ln2)
    assert(got(3) == 10.0 * Portable.Ln2)
    assert(got(4) == -2.0 * Portable.Ln2)
    assert(got(5) == -20.0 * Portable.Ln2)
  }

  test("pln propagates null") {
    import spark.implicits._
    val r = Portable.pln(Seq[Option[Double]](Some(2.0), None).toDF("x"), col("x"), "y")
      .select("y").collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
  }
}
