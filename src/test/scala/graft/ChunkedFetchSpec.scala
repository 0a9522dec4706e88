package graft

import graft.ingest.ChunkedFetch
import graft.ingest.ChunkedFetch.Chunk
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicIntegerArray

/** Partitioned chunked-range ingestion (pipeline_helpers.py:221-244 as a
  * one-task-per-chunk source): the chunk calendar must match the
  * reference's while-loop, N chunks must run as N distinct tasks, the
  * assembled frame must equal a serial driver-side fetch, and a flaky
  * chunk must retry alone and succeed. */
class ChunkedFetchSpec extends SparkSpec {

  import ChunkedFetchSpec.{daySec, stubRows}
  private val t2018 = Timestamp.valueOf("2018-01-01 00:00:00").getTime / 1000

  test("chunkCalendar mirrors the reference loop: 179-day spans, +1 day step, clipped tail") {
    val to = t2018 + 500 * daySec
    val chunks = ChunkedFetch.chunkCalendar(t2018, to)
    assert(chunks.map(_.idx) == chunks.indices)
    assert(chunks.head.fromSec == t2018)
    chunks.foreach(c => assert(c.toSec == math.min(c.fromSec + 179 * daySec, to)))
    chunks.zip(chunks.tail).foreach { case (a, b) =>
      assert(b.fromSec == a.toSec + daySec)
    }
    assert(chunks.last.toSec == to)            // tail clipped, nothing beyond
    assert(chunks.size == 3)                   // 500 days / (179+1) → 3 windows
  }

  test("N chunks run as N tasks and assemble the same frame as a serial fetch") {
    import spark.implicits._
    val to = t2018 + 1200 * daySec
    val chunks = ChunkedFetch.chunkCalendar(t2018, to)
    assert(chunks.size == 7)
    val ds = ChunkedFetch.fetchPartitioned(spark, chunks,
      (ch: Chunk) => stubRows(ch).map { case (ts, v) =>
        (ts, v, ChunkedFetch.currentPartition()) })
    assert(ds.rdd.getNumPartitions == chunks.size, "one partition per chunk")
    val rows = ds.collect()
    // one-chunk-per-task: every chunk's rows came from a distinct task
    assert(rows.map(_._3).distinct.sorted.toSeq == chunks.indices)
    // distributed assembly == the reference's serial while-loop assembly
    val serial = chunks.flatMap(stubRows)
    assert(rows.map(r => (r._1, r._2)).sortBy(_._1).toSeq == serial.sortBy(_._1))
  }

  test("a flaky chunk retries alone with backoff and still assembles completely") {
    import spark.implicits._
    val chunks = ChunkedFetch.chunkCalendar(t2018, t2018 + 700 * daySec)
    // fail chunk 2 on its first two attempts, succeed on the third; the
    // counter lives in a shared object (local[*] = one JVM in tests)
    FlakyState.attempts = new AtomicIntegerArray(chunks.size)
    val ds = ChunkedFetch.fetchPartitioned(spark, chunks,
      (ch: Chunk) => {
        val n = FlakyState.attempts.incrementAndGet(ch.idx)
        if (ch.idx == 2 && n <= 2) sys.error(s"simulated 429 on attempt $n")
        stubRows(ch)
      }, maxRetries = 3, backoffMs = 1L)
    val got = ds.collect().sortBy(_._1).toSeq
    assert(got == chunks.flatMap(stubRows).sortBy(_._1))
    assert(FlakyState.attempts.get(2) == 3)    // retried exactly twice
    chunks.indices.filter(_ != 2).foreach(i => assert(FlakyState.attempts.get(i) == 1))
  }

  test("a chunk that exhausts retries fails the job (fail-fast, not partial data)") {
    import spark.implicits._
    val chunks = ChunkedFetch.chunkCalendar(t2018, t2018 + 400 * daySec)
    val ex = intercept[Throwable] {
      ChunkedFetch.fetchPartitioned(spark, chunks,
        (ch: Chunk) =>
          if (ch.idx == 1) sys.error("permanent upstream failure")
          else stubRows(ch),
        maxRetries = 1, backoffMs = 1L).collect()
    }
    val messages = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("chunk 1"), s"fail-fast error must name the chunk: $messages")
  }
}

/** Fixtures live OUTSIDE the suite class so fetch closures never capture
  * the (non-serializable) ScalaTest engine; FlakyState is executor-side
  * shared state (local[*] = one JVM in tests). */
object ChunkedFetchSpec {
  val daySec: Long = 24L * 60 * 60

  /** Deterministic stand-in for the OHLC-range endpoint: one (ts, close)
    * row per day of the chunk, value derived from the timestamp. */
  def stubRows(ch: Chunk): Iterator[(Long, Double)] =
    Iterator.iterate(ch.fromSec)(_ + daySec).takeWhile(_ <= ch.toSec)
      .map(ts => (ts, (ts % 100000).toDouble / 7.0))
}

object FlakyState {
  @volatile var attempts: AtomicIntegerArray = _
}
