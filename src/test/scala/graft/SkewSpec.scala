package graft

import graft.operators.Skew
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted two-phase aggregation equals the plain aggregation") {
    val rnd = new scala.util.Random(5)
    // zipf-ish: one hot key dominating
    val rows = (1 to 20000).map { i =>
      val key = if (i % 10 != 0) "hot" else s"k${rnd.nextInt(50)}"
      (key, rnd.nextInt(100).toDouble)
    }
    val df = spark.sparkContext.parallelize(rows, 8).toDF("key", "v")
    val salted = Skew.saltedCountSum(df, Seq("key"), "v", salts = 16)
      .as[(String, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val plain = df.groupBy("key")
      .agg(org.apache.spark.sql.functions.count("*").as("n"),
        org.apache.spark.sql.functions.sum("v").as("total"))
      .as[(String, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(salted.keySet === plain.keySet)
    for ((k, (n, _)) <- plain) assert(salted(k)._1 === n)
    // sums of doubles: salted partials reorder additions — compare with tolerance
    for ((k, (_, s)) <- plain) assert(math.abs(salted(k)._2 - s) < 1e-6)
  }
}
