package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke coverage of the driver contract on sf0.001. Full per-query
  * correctness runs through Verify + the DuckDB oracle (tools/oracle_check.py).
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = s"${TestSpark.testdataDir}/sf0.001"

  test("entry returns enriched candles") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.contains("atr"))
    assert(df.count() > 0)
  }

  test("every query has deterministic output and every oracle key exists") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship queries run on sf0.001") {
    for (name <- Seq("q01_pricing_summary", "q10_ohlc_candles", "q13_atr_wilder")) {
      assert(SparkEntry.queries(name)(spark, dir).count() > 0, name)
    }
  }
}
