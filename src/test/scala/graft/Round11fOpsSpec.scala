package graft

import graft.queries.{CoreQueries, SessionQueries}

/** Round-11 batch-6: the Markov stationary mix against an unrolled Scala
  * power-iteration replay, and the JSONL round-trip against the parquet
  * originals (escaping must be value-exact, including the md5 over text).
  */
class Round11fOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0

  test("event_markov_stationary: sf0.001 equals the unrolled power-iteration replay") {
    val ev = graft.util.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(e => (e._4, e._2))
      s.sliding(2).collect { case Array(a, b) => (a._3, b._3) }
    }
    val byFrom = trans.groupBy(_._1)
    val pm = byFrom.flatMap { case (f, g) =>
      g.groupBy(_._2).map { case (t, h) => ((f, t), h.size.toDouble / g.size) }
    }
    val types = ev.map(_._3).distinct.sorted
    def gsum(xs: Iterable[Double]): Double =
      xs.map(x => math.floor(x * Grid).toLong).sum.toDouble / Grid
    var pi: Map[String, Double] = types.map(_ -> 1.0 / types.size).toMap
    for (_ <- 1 to 3)
      pi = types.map { t =>
        t -> gsum(types.flatMap(f => pm.get((f, t)).flatMap(p =>
          pi.get(f).map(_ * p))))
      }.toMap.filter(_._2 != 0.0) match {
        case m => m // keep sparse like the join (absent = 0)
      }
    val expected = types.map(t =>
      t -> math.floor(pi.getOrElse(t, 0.0) * Grid).toLong).toMap
    val got = SessionQueries.eventMarkovStationary.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // 3 iterations of a dense chain conserve mass to within grid slack
    val mass = got.values.sum.toDouble / Grid
    assert(mass > 0.999 && mass <= 1.0 + 1e-9, s"mass=$mass")
  }

  test("scan_jsonl: round trip is value-identical to the parquet originals") {
    val got = CoreQueries.scanJsonl.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4))).toSet
    val expected = graft.util.Tables.documents(spark, sf)
      .filter("text IS NOT NULL")
      .selectExpr("doc_id", "lang", "source", "n_chars",
        "md5(CAST(text AS BINARY)) AS text_md5")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4))).toSet
    assert(got == expected)
    assert(got.size == 500)
  }
}
