package graft

import graft.operators.Ohlc
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class OhlcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val ticks = Seq(
    // (event_id, ts, event_type, value)
    (1L, ts("2026-02-02 09:15:01"), "A", 100.0),
    (2L, ts("2026-02-02 09:16:00"), "A", 105.0),
    (3L, ts("2026-02-02 09:19:59"), "A", 95.0),
    (4L, ts("2026-02-02 09:20:00"), "A", 101.0), // boundary → 09:20 window
    (5L, ts("2026-02-02 09:15:30"), "B", 50.0),
    // equal timestamps → seq breaks open/close ties
    (6L, ts("2026-02-02 09:15:30"), "B", 51.0),
    (7L, ts("2026-02-02 09:15:30"), "B", 49.0)
  ).toDF("event_id", "ts", "event_type", "value")

  test("OHLC per 5-minute window with boundary and tie semantics") {
    val out = Ohlc.candles(ticks).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toString, r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .sortBy(t => (t._1, t._2))
    assert(out === Array(
      ("A", "2026-02-02 09:15:00.0", 100.0, 105.0, 95.0, 95.0, 3L),
      ("A", "2026-02-02 09:20:00.0", 101.0, 101.0, 101.0, 101.0, 1L),
      // open = first arrival (seq 5), close = last arrival (seq 7)
      ("B", "2026-02-02 09:15:00.0", 50.0, 51.0, 49.0, 49.0, 3L)))
  }

  test("OHLC invariants hold — violation detector empty") {
    assert(Ohlc.invariantViolations(Ohlc.candles(ticks)).count() === 0)
  }

  test("property: candles are invariant under tick arrival permutation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      (i.toLong, ts(f"2026-02-02 ${9 + rnd.nextInt(2)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"),
        s"S${rnd.nextInt(4)}", math.rint(rnd.nextDouble() * 10000) / 100)
    }
    def run(data: Seq[(Long, Timestamp, String, Double)], parts: Int) =
      Ohlc.candles(spark.sparkContext.parallelize(data, parts)
          .toDF("event_id", "ts", "event_type", "value"))
        .collect().map(_.toSeq).toSet
    val a = run(rows, 2)
    val b = run(scala.util.Random.shuffle(rows), 7)
    assert(a === b)
  }
}
