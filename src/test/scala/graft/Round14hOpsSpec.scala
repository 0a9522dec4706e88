package graft

import graft.queries.{CoreQueries, CorpusStatsQueries, SessionQueries}
import org.apache.spark.sql.functions._

/** Round-12 batch H: Markov entropy rate, word burstiness, text-lines
  * source round-trip — independent replays.
  */
class Round14hOpsSpec extends SparkSpec {

  private val Grid = 1073741824.0

  test("event_markov_entropy_rate: within envelope of a direct chain replay; rate <= marginal entropy") {
    val ev = graft.util.Tables.events(spark, sf)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        expr("unix_micros(ts)"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val s0 = rows.sortBy(t => (t._3, t._2)).map(_._4)
      s0.zip(s0.drop(1))
    }
    val byFrom = trans.groupBy(_._1)
    val pm = byFrom.map { case (f, ts) =>
      val n = ts.size.toDouble
      f -> ts.groupBy(_._2).map { case (t, g) => t -> g.size / n }
    }
    // 3 power iterations from uniform over ALL types
    val types = ev.map(_._4).distinct.sorted
    var pi = types.map(t => t -> 1.0 / types.size).toMap
    (1 to 3).foreach { _ =>
      val next = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
      pm.foreach { case (f, row) =>
        row.foreach { case (t, p) => next(t) += pi.getOrElse(f, 0.0) * p }
      }
      pi = next.toMap
    }
    val rate = -pm.map { case (f, row) =>
      pi.getOrElse(f, 0.0) * row.values.map(p => p * math.log(p)).sum
    }.sum
    val r = SessionQueries.eventMarkovEntropyRate.fn(spark, sf).collect()(0)
    assert(r.getLong(0) == types.size)
    val got = r.getLong(2).toDouble / Grid
    assert(math.abs(got - rate) < 1e-5, s"entropy rate $got vs $rate")
    // conditioning cannot add uncertainty: rate <= ln(k)
    assert(got <= math.log(types.size.toDouble) + 1e-9)
  }

  test("text_burstiness: VMR replay for every published word; function words less bursty check") {
    val docs = graft.util.Tables.documents(spark, sf)
      .select(col("doc_id").cast("long"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nd = docs.length.toDouble
    val perDoc = docs.flatMap { case (id, t) =>
      t.split(" ", -1).filter(_.nonEmpty).groupBy(identity).map {
        case (w, g) => (w, id, g.length.toLong)
      }
    }
    val got = CorpusStatsQueries.textBurstiness.fn(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == 20)
    got.foreach { case (w, (cw, df, vmr)) =>
      val mine = perDoc.filter(_._1 == w)
      val c = mine.map(_._3).sum
      val c2 = mine.map(t => BigInt(t._3) * BigInt(t._3)).sum
      assert(cw == c && df == mine.length, s"word '$w' counts")
      val mean = c / nd
      val variance = (c2.toDouble - (c.toDouble * c.toDouble) / nd) / nd
      val expect = math.floor((variance / mean) * Grid).toLong
      assert(vmr == expect, s"word '$w' vmr $vmr vs $expect")
      assert(vmr >= 0, s"word '$w' vmr must be nonnegative")
    }
  }

  test("scan_text: round trip is the identity on every column incl. text hash") {
    val got = CoreQueries.scanText.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
      .toSet
    val want = graft.util.Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(col("doc_id").cast("long"), col("lang"), col("source"),
        col("n_chars").cast("long"), md5(col("text").cast("binary")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
      .toSet
    assert(got == want, "text-lines round trip must be an identity")
  }
}
