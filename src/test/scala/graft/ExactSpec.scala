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

  test("withRollingMoments matches frame-based sums and stays exact in range") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // values near the documented magnitude bound (~1e5, like
    // l_extendedprice): prefix-difference moments must equal the
    // frame-window recipe bit-for-bit
    val rows = (1 to 500).map(i => (i % 3, i.toLong, (i * 97 % 99999) + 0.12345678))
    val df = rows.toDF("k", "ord", "v")
    val w = Window.partitionBy("k").orderBy("ord")
    val viaMoments = Exact.withRollingMoments(df, col("v"), w, 30, "m")
      .select(col("k"), col("ord"), col("m_s"), col("m_q"))
    val f = w.rowsBetween(-29, 0)
    val viaFrames = df.select(col("k"), col("ord"),
      Exact.winSum(col("v"), f).as("f_s"),
      sum((col("v") * col("v")).cast(org.apache.spark.sql.types.DecimalType(38, 4)))
        .over(f).cast("double").as("f_q"))
    val joined = viaMoments.join(viaFrames, Seq("k", "ord"))
    assert(joined.filter(col("m_s") =!= col("f_s") || col("m_q") =!= col("f_q"))
      .count() == 0) // bit-identical
  }

  test("withRollingMoments overflow surfaces as null, never a wrong value") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // violate the documented precondition: |sum(x)| beyond DECIMAL(18,8)'s
    // 10^10 value range ⇒ the cumulative cast must null out (ANSI-off
    // overflow), not silently truncate
    val rows = (1 to 20).map(i => (1, i.toLong, 9.9e9))
    val df = rows.toDF("k", "ord", "v")
    val w = Window.partitionBy("k").orderBy("ord")
    val out = Exact.withRollingMoments(df, col("v"), w, 5, "m")
    assert(out.filter(col("m_s").isNull).count() > 0)
    // and no surviving value is a plausible-but-wrong partial sum
    assert(out.filter(col("m_s").isNotNull && col("m_s") > 1e10 * 5).count() == 0)
  }

  test("pinScore is the exact binary-grid floor and absorbs ulp-scale drift") {
    import spark.implicits._
    val gen = Gen.listOfN(4000, Gen.choose(-500.0, 500.0))
    val xs = gen.apply(Gen.Parameters.default, Seed(7L)).get
      .map(x => math.log(math.abs(x) + 1e-3) * 37.0) // transcendental-ish domain
    val got = xs.map(Tuple1(_)).toDF("v")
      .select(Exact.pinScore(col("v")).as("p")).collect().map(_.getDouble(0))
    // the reference recipe uses only IEEE-exact ops; Spark must match it bit-for-bit
    val ref = xs.map(x => math.floor(x * 1073741824.0) / 1073741824.0)
    assert(got.toSeq == ref)
    // idempotent (grid points are fixed points), and off-grid drift below the
    // distance to the next boundary cannot move the pinned value
    assert(ref.map(x => math.floor(x * 1073741824.0) / 1073741824.0).toSeq == ref)
    val nudged = xs.map(x => math.floor((x + math.ulp(x)) * 1073741824.0) / 1073741824.0)
    val flips = nudged.zip(ref).count { case (a, b) => a != b }
    assert(flips < xs.size / 100, s"ulp-nudge flipped $flips of ${xs.size}")
  }

  test("pinScoreInt is the grid CELL of pinScore: integer-typed, stacking-stable, null-safe") {
    import spark.implicits._
    val gen = Gen.listOfN(4000, Gen.choose(-500.0, 500.0))
    val xs = gen.apply(Gen.Parameters.default, Seed(11L)).get
      .map(x => math.log(math.abs(x) + 1e-3) * 37.0)
    val rows = xs.map(Tuple1(_)).toDF("v")
      .select(Exact.pinScoreInt(col("v")).as("c"),
        Exact.pinScoreInt(Exact.pinScore(col("v"))).as("stacked"),
        Exact.pinScore(col("v")).as("p"))
      .collect()
    rows.zip(xs).foreach { case (r, x) =>
      val cell = r.getLong(0)
      // the cell IS floor(x·2^30), and cell/2^30 recovers the pinned double
      assert(cell == math.floor(x * 1073741824.0).toLong)
      assert(cell / 1073741824.0 == r.getDouble(2))
      // stacking on an already-pinned double publishes the SAME cell —
      // the r10 query pattern (pin internally, int-publish at the edge)
      assert(r.getLong(1) == cell)
    }
    // null in, null out — and the column is LongType (no double in schema)
    val n = Seq(Tuple1(Option.empty[Double])).toDF("v")
      .select(Exact.pinScoreInt(col("v")))
    assert(n.schema.head.dataType == org.apache.spark.sql.types.LongType)
    assert(n.collect().head.isNullAt(0))
  }

  test("portableSum is partition-order-invariant and decimal-cast-free exact") {
    import spark.implicits._
    // log-derived addends — the domain where the DECIMAL detour drifted
    // across oracle-engine versions (VERDICT r7 #1)
    val vals = (1 to 5000).map(i => (i % 7, i.toDouble * math.log(i + 1.0)))
    val df = vals.toDF("k", "v")
    val a = df.repartition(1).groupBy("k").agg(Exact.portableSum(col("v")).as("s"))
      .orderBy("k").collect().map(_.getDouble(1)).toSeq
    val b = df.repartition(32).groupBy("k").agg(Exact.portableSum(col("v")).as("s"))
      .orderBy("k").collect().map(_.getDouble(1)).toSeq
    assert(a == b) // bit-identical
    // and equal to the integer-grid reference computed on the driver
    val ref = vals.groupBy(_._1).view.mapValues(
      g => g.map(v => math.floor(v._2 * 1073741824.0).toLong).sum / 1073741824.0
    ).toMap
    val gotMap = df.groupBy("k").agg(Exact.portableSum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    ref.foreach { case (k, v) => assert(gotMap(k) == v, s"key $k") }
  }

  test("portableSumAt: k=30 reproduces portableSum bit-exactly; the adaptive " +
    "exponent survives where the fixed grid wraps int64") {
    import spark.implicits._
    val vals = (1 to 3000).map(i => (i % 5, i.toDouble * math.log(i + 1.0)))
    val df = vals.toDF("k", "v")
    val fixed = df.groupBy("k").agg(Exact.portableSum(col("v")).as("s"))
      .orderBy("k").collect().map(_.getDouble(1)).toSeq
    val at30 = df.groupBy("k").agg(
      Exact.portableSumAt(col("v"), 1073741824.0).as("s"))
      .orderBy("k").collect().map(_.getDouble(1)).toSeq
    assert(fixed == at30) // the floor of the adaptive family IS the old grid
    // wrap demonstration: addends sized so Σ·2³⁰ exceeds 2⁶³ (the
    // q_agg_beta_market ×100 mechanism) — the fixed grid's long sum
    // wraps NEGATIVE on an all-positive column; the corpus-adaptive
    // exponent (k from the bitlength rule) keeps every cell sum inside
    // int64 and lands within one grid step per addend of the true sum
    val n = 1000
    val big = (1 to n).map(i => 1.0e7 + i).toDF("v") // Σ·2³⁰ ≈ 1.07e19 > 2⁶³
    val wrapped = big.agg(Exact.portableSum(col("v"))).head.getDouble(0)
    assert(wrapped < 0.0, s"expected int64 wrap, got $wrapped")
    def bits(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, x))
    val k = math.min(30, math.max(0, 62 - bits((1.0e7 + n).toLong + 1) - bits(n.toLong)))
    val gf = math.pow(2.0, k)
    val adaptive = big.agg(Exact.portableSumAt(col("v"), gf)).head.getDouble(0)
    val truth = (1 to n).map(i => 1.0e7 + i).sum
    assert(adaptive > 0.0 && math.abs(adaptive - truth) <= n / gf + 1.0,
      s"adaptive $adaptive vs $truth at k=$k")
  }
}
