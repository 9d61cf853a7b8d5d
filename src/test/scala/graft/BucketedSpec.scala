package graft

import graft.sink.Bucketed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("same-bucketed tables join with zero shuffle exchanges") {
    val orders = (1L to 200L).map(k => (k, s"o$k")).toDF("okey", "opayload")
    val lines = (1L to 200L).flatMap(k => Seq((k, 1, 10.0), (k, 2, 20.0)))
      .toDF("okey", "line", "amount")
    Bucketed.writeBucketed(orders, "b_orders", numBuckets = 4, keys = Seq("okey"))
    Bucketed.writeBucketed(lines, "b_lines", numBuckets = 4, keys = Seq("okey"))
    try {
      val joined = Bucketed.bucketedJoin(spark, "b_orders", "b_lines", Seq("okey"))
      assert(joined.count() === 400L)
      // the whole point: co-located buckets, no Exchange on either side
      assert(Bucketed.exchangeCount(joined) === 0,
        joined.queryExecution.executedPlan.toString)
      // the unbucketed formulation of the same sort-merge join DOES shuffle
      val plain = orders.hint("merge").join(lines.hint("merge"), Seq("okey"))
      plain.count()
      assert(Bucketed.exchangeCount(plain) > 0)
      // bucketed group-by on the key is also exchange-free
      val agg = spark.table("b_lines").groupBy($"okey").agg(sum($"amount"))
      agg.count()
      assert(Bucketed.exchangeCount(agg) === 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }
}
