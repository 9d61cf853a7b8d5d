package graft

import graft.operators.GapFill
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class GapFillSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // A trades in w1 and w3 (silent in w2); B first appears in w3 (cold start)
  private val candles = Seq(
    (ts("2026-02-02 09:15:00"), "A", 10.0, 12.0, 9.0, 11.0, 5L),
    (ts("2026-02-02 09:25:00"), "A", 11.5, 13.0, 11.0, 12.0, 4L),
    (ts("2026-02-02 09:25:00"), "B", 50.0, 50.0, 50.0, 50.0, 1L)
  ).toDF("window_start", "symbol", "open", "high", "low", "close", "tick_count")

  test("gap-fill synthesizes flat candle from last close; cold start drops") {
    val out = GapFill.fill(candles).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toString, r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6), r.getBoolean(7)))
      .sortBy(t => (t._1, t._2))
    assert(out === Array(
      ("A", "2026-02-02 09:15:00.0", 10.0, 12.0, 9.0, 11.0, 5L, false),
      // gap: o=h=l=c = prev close 11.0, tick_count 0, flagged
      ("A", "2026-02-02 09:20:00.0", 11.0, 11.0, 11.0, 11.0, 0L, true),
      ("A", "2026-02-02 09:25:00.0", 11.5, 13.0, 11.0, 12.0, 4L, false),
      // B has no prior close at 09:15/09:20 → unfillable, dropped
      ("B", "2026-02-02 09:25:00.0", 50.0, 50.0, 50.0, 50.0, 1L, false)))
  }

  test("session gap-fill seeds a silent day from the previous day's close") {
    // day 1: A and B trade; day 2: only B trades (A fully silent);
    // day 3: both trade. C appears only on day 3 (cold start before that).
    val multiDay = Seq(
      (ts("2026-02-02 09:15:00"), "A", 10.0, 12.0, 9.0, 11.0, 5L),
      (ts("2026-02-02 09:20:00"), "B", 50.0, 50.0, 50.0, 50.0, 1L),
      (ts("2026-02-03 09:15:00"), "B", 51.0, 51.0, 51.0, 51.0, 2L),
      (ts("2026-02-04 09:15:00"), "A", 14.0, 14.0, 14.0, 14.0, 1L),
      (ts("2026-02-04 09:15:00"), "C", 7.0, 7.0, 7.0, 7.0, 1L)
    ).toDF("window_start", "symbol", "open", "high", "low", "close", "tick_count")
    val out = GapFill.fillSessions(multiDay).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toString, r.getDouble(5),
        r.getLong(6), r.getBoolean(7)))
      .sortBy(t => (t._1, t._2))
    // A on silent day 2 is synthesized flat at day-1 close 11.0
    assert(out.contains(("A", "2026-02-03 09:15:00.0", 11.0, 0L, true)))
    // A's day-1 09:20 slot (grid from B's candle) fills intraday
    assert(out.contains(("A", "2026-02-02 09:20:00.0", 11.0, 0L, true)))
    // C before its first candle is cold-start dropped
    assert(!out.exists(t => t._1 == "C" && t._2 < "2026-02-04"))
    // intra-task frames never cross days: every filled value matches the
    // chain of observed closes, so real candles pass through untouched
    assert(out.contains(("A", "2026-02-04 09:15:00.0", 14.0, 1L, false)))
    assert(out.contains(("B", "2026-02-04 09:15:00.0", 51.0, 0L, true)))
  }

  test("missing census lists exactly the empty grid slots") {
    val missing = GapFill.missingCensus(candles).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toString)).sorted
    assert(missing === Array(
      ("A", "2026-02-02 09:20:00.0"),
      ("B", "2026-02-02 09:15:00.0"),
      ("B", "2026-02-02 09:20:00.0")))
    // single session: the day-bounded variant is slot-identical
    val bounded = GapFill.missingCensusSessions(candles).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toString)).sorted
    assert(bounded === missing)
  }

  /** ScalaCheck property locking the q51/q54 pair against plan changes:
    * for random multi-day, multi-symbol sparse candle sets, fillSessions
    * and missingCensusSessions partition each day's observed grid exactly —
    * fill output = real candles ∪ (census slots with a known prev close),
    * synthesized values follow the intraday-then-previous-day-close seed
    * chain, and cold-start slots are exactly the census slots fill drops.
    * Checked against an independent in-memory model, 200 seeded cases.
    */
  test("property: fillSessions/missingCensusSessions partition each day grid (200 cases)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val dates = Seq("2026-02-02", "2026-02-03", "2026-02-04", "2026-02-05")
    val slots = Seq("09:15:00", "09:20:00", "09:25:00", "09:30:00", "09:35:00")
    val symsAll = Seq("A", "B", "C", "D")
    val cellGen = Gen.frequency(
      (35, Gen.choose(10, 99).map(v => Some(v.toDouble))),
      (65, Gen.const(Option.empty[Double])))
    val caseGen: Gen[Seq[(String, String, String, Double)]] = for {
      nDays <- Gen.choose(1, 4)
      nSyms <- Gen.choose(1, 4)
      combos = for {
        d <- dates.take(nDays); t <- slots; s <- symsAll.take(nSyms)
      } yield (d, t, s)
      cells <- Gen.sequence[List[Option[Double]], Option[Double]](combos.map(_ => cellGen))
    } yield combos.zip(cells).collect { case ((d, t, s), Some(v)) => (d, t, s, v) }

    def model(cells: Seq[(String, String, String, Double)]) = {
      val present = cells.map { case (d, t, s, v) => (d, t, s) -> v }.toMap
      val syms = cells.map(_._3).distinct.sorted
      val dayBounds = cells.groupBy(_._1).map { case (d, cs) =>
        d -> (cs.map(_._2).min, cs.map(_._2).max)
      }
      val dayGrid: Map[String, Seq[String]] = dayBounds.map { case (d, (lo, hi)) =>
        d -> slots.filter(t => t >= lo && t <= hi)
      }
      val grid = for {
        (d, ts) <- dayGrid.toSeq; t <- ts; s <- syms
      } yield (d, t, s)
      val census = grid.filterNot(present.contains).toSet
      // (sym, "d t") -> (open, high, low, close, tick, gapFilled)
      val fill = scala.collection.mutable.Map
        .empty[(String, String), (Double, Double, Double, Double, Long, Boolean)]
      syms.foreach { s =>
        var daySeed = Option.empty[Double]
        dayGrid.keys.toSeq.sorted.foreach { d =>
          var lastReal = Option.empty[Double]
          dayGrid(d).foreach { t =>
            present.get((d, t, s)) match {
              case Some(v) =>
                fill((s, s"$d $t")) = (v + 1, v + 2, v - 1, v, 1L, false)
                lastReal = Some(v)
              case None =>
                lastReal.orElse(daySeed).foreach { pc =>
                  fill((s, s"$d $t")) = (pc, pc, pc, pc, 0L, true)
                }
            }
          }
          if (lastReal.isDefined) daySeed = lastReal
        }
      }
      (grid.toSet, census, fill.toMap)
    }

    val prop = Prop.forAll(caseGen) { cells =>
      cells.isEmpty || {
        val (grid, wantCensus, wantFill) = model(cells)
        val df = cells.map { case (d, t, s, v) =>
          (ts(s"$d $t"), s, v + 1, v + 2, v - 1, v, 1L)
        }.toDF("window_start", "symbol", "open", "high", "low", "close", "tick_count")
        val gotCensus = GapFill.missingCensusSessions(df).collect()
          .map(r => { val w = r.getTimestamp(0).toString.take(19)
            (w.take(10), w.drop(11), r.getString(1)) }).toSet
        val gotFill = GapFill.fillSessions(df).collect()
          .map(r => (r.getString(1), r.getTimestamp(0).toString.take(19)) ->
            ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
              r.getLong(6), r.getBoolean(7)))).toMap
        val censusOk = gotCensus == wantCensus
        val fillOk = gotFill == wantFill
        // partition: every grid slot is filled or censused; fills outside
        // the census are exactly the real candles; no slot is both
        // synthesized and real
        val slotsOf = gotFill.keySet.map { case (s, w) => (w.take(10), w.drop(11), s) }
        val partitionOk = (slotsOf ++ gotCensus) == grid &&
          (slotsOf -- gotCensus) == cells.map(c => (c._1, c._2, c._3)).toSet
        if (!(censusOk && fillOk && partitionOk))
          println(s"COUNTEREXAMPLE cells=$cells\n census got=$gotCensus want=$wantCensus\n " +
            s"fill got=$gotFill\n fill want=$wantFill")
        censusOk && fillOk && partitionOk
      }
    }
    val prevPart = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try {
      val res = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(200)
          .withInitialSeed(org.scalacheck.rng.Seed(42L)),
        prop)
      assert(res.passed, res.status.toString)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevPart)
  }

  test("day-bounded census never materializes overnight slots") {
    // two sessions a day apart: the global grid spans the overnight gap
    // (~287 five-minute slots), the session grid only the traded ranges
    val twoDays = Seq(
      (ts("2026-02-02 09:15:00"), "A", 10.0, 10.0, 10.0, 10.0, 1L),
      (ts("2026-02-02 09:25:00"), "A", 11.0, 11.0, 11.0, 11.0, 1L),
      (ts("2026-02-03 09:15:00"), "A", 12.0, 12.0, 12.0, 12.0, 1L),
      (ts("2026-02-03 09:25:00"), "B", 50.0, 50.0, 50.0, 50.0, 1L)
    ).toDF("window_start", "symbol", "open", "high", "low", "close", "tick_count")
    val bounded = GapFill.missingCensusSessions(twoDays).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toString)).sorted
    // day 1 session = 09:15..09:25 (3 slots × {A,B}), day 2 likewise:
    // missing = A@d1 09:20, B@d1 all 3, A@d2 {09:20, 09:25}, B@d2 {09:15, 09:20}
    assert(bounded === Array(
      ("A", "2026-02-02 09:20:00.0"),
      ("A", "2026-02-03 09:20:00.0"),
      ("A", "2026-02-03 09:25:00.0"),
      ("B", "2026-02-02 09:15:00.0"),
      ("B", "2026-02-02 09:20:00.0"),
      ("B", "2026-02-02 09:25:00.0"),
      ("B", "2026-02-03 09:15:00.0"),
      ("B", "2026-02-03 09:20:00.0")))
    // and the global variant would have materialized the overnight span
    assert(GapFill.missingCensus(twoDays).count() > bounded.length)
  }
}
