package graft

import graft.queries.{JoinQueries, SessionQueries}
import org.apache.spark.sql.functions._

/** Round-13 lake/join operators: the SCD2 point-in-time read against a
  * direct latest-event-at-or-before replay, and the salted skew join
  * against the plain unsalted join it must be logically identical to.
  */
class Round13eOpsSpec extends SparkSpec {

  test("scd2_pit: PIT slice equals the direct latest-event-at-or-before definition") {
    val tUs = java.sql.Timestamp.valueOf("2024-01-15 00:00:00").getTime * 1000L
    val ev = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).flatMap { case (uid, xs) =>
      val sorted = xs.sortBy(x => (x._3, x._2))
      // runs of identical consecutive state
      val runs = sorted.foldLeft(Vector.empty[(String, Long)]) { (acc, e) =>
        if (acc.nonEmpty && acc.last._1 == e._4) acc
        else acc :+ (e._4, e._3)
      }
      val upTo = runs.takeWhile(_._2 <= tUs)
      if (upTo.isEmpty) None
      else Some((uid, upTo.last._1, upTo.length.toLong, upTo.last._2))
    }.toSet
    val got = SessionQueries.scd2Pit.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "the PIT snapshot must be nonempty at this instant")
    assert(got.groupBy(_._1).forall(_._2.size == 1), "exactly one state per user")
  }

  test("join_salted_skew: salted result is row-identical to the plain unsalted join") {
    val li = graft.util.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice")
    val o = graft.util.Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val plain = li.join(o, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_lines"),
        graft.util.Exact.exactSum(col("l_extendedprice")).as("revenue"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = JoinQueries.joinSaltedSkew.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain, "salting must have zero logical footprint")
    // the salt really spreads: each order's lines map to more than one salt
    // value whenever it has lines with distinct linenumber mod 8
    val salts = graft.util.Tables.lineitem(spark, sf)
      .select(pmod(col("l_orderkey") + col("l_linenumber"), lit(8)).as("salt"))
      .distinct().collect().map(_.getLong(0) % 8).toSet
    assert(salts.size == 8, "all 8 salt buckets must be populated")
  }
}
