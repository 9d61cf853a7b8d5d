package graft
import org.apache.spark.sql.SparkSession
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1)) {
      val df = SparkEntry.queries(q)(spark, args(0))
      val s = df.queryExecution.executedPlan.toString
      val spans = s.linesIterator.flatMap(l =>
        "\\*\\((\\d+)\\)".r.findAllMatchIn(l).map(_.group(1).toInt)).toSet
      val naked = s.linesIterator.filter(l =>
        l.contains("HashAggregate") && !l.contains("*(")).take(4).toList
      println(s"== $q wholestage_spans=${spans.size} non_codegen_hashaggs=${naked.size}")
      naked.foreach(l => println("   " + l.trim.take(110)))
    }
    spark.stop()
  }
}
