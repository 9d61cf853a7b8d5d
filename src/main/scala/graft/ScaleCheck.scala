package graft

import graft.operators.{Atr, GapFill, Ohlc}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: in-plan scale expansion of the tick stream (no files written) —
  * replicate events ×FACTOR with per-replica symbol salting, then drive
  * candles → gap-fill → ATR end-to-end and report rows/sec. Surfaces
  * shuffle/skew/spill pathologies the tiny SFs hide.
  * Usage: runMain graft.ScaleCheck [sfDir] [factor]
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = Tables.events(spark, sfDir)
    val expanded = ev
      .withColumn("rep", explode(sequence(lit(0), lit(factor - 1))))
      .select(
        (col("event_id") * factor + col("rep")).as("event_id"),
        col("ts"),
        concat(col("event_type"), lit("_"), col("rep")).as("event_type"),
        col("value"))
      .repartition(cpus.toInt)
    val nTicks = expanded.count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // cache stage inputs so each timing is the stage's marginal cost, not a
    // recompute of the whole upstream chain
    val candles = Ohlc.candles(expanded).cache()
    val nCandles = time(s"OHLC over $nTicks ticks")(candles.count())
    val filled = GapFill.fill(candles).cache()
    val nFilled = time("gap-fill (dense grid)")(filled.count())
    val nEnriched = time("Wilder ATR over gap-filled")(Atr.enrich(filled).toDF().count())
    println(s"[scale] ticks=$nTicks candles=$nCandles filled=$nFilled enriched=$nEnriched " +
      f"symbols=${factor * 5} tickRate=${nTicks / 1e6}%.1fM")
    spark.stop()
  }
}
