package graft

import graft.streaming.FullPipeline
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Epoch-staged state commit: the three per-cycle snapshots publish
  * atomically (all-old or all-new, never a mix), crashed stages are
  * ignored, and pre-epoch legacy layouts still read.
  */
class FullPipelineStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-state").toString

  test("commitState publishes all parts together and readState sees the latest epoch") {
    val root = tmp()
    FullPipeline.commitState(spark, root, Map(
      "last_close" -> Seq(("A", 1.0)).toDF("symbol", "seed_close"),
      "atr_state" -> Seq(("A", 0.5)).toDF("symbol", "prev_atr")))
    FullPipeline.commitState(spark, root, Map(
      "last_close" -> Seq(("A", 2.0)).toDF("symbol", "seed_close"),
      "atr_state" -> Seq(("A", 0.7)).toDF("symbol", "prev_atr")))
    val close = FullPipeline.readState(spark, root, "last_close").get
      .as[(String, Double)].head()
    val atr = FullPipeline.readState(spark, root, "atr_state").get
      .as[(String, Double)].head()
    assert(close === ("A", 2.0))
    assert(atr === ("A", 0.7))
  }

  test("an unmarked (crashed) epoch is invisible to readers") {
    val root = tmp()
    FullPipeline.commitState(spark, root, Map(
      "meta" -> Seq(Tuple1("old")).toDF("v")))
    // simulate a crash mid-epoch: parts written, no _COMMIT marker
    Seq(Tuple1("torn")).toDF("v").write.parquet(s"$root/state/e99/meta")
    assert(FullPipeline.readState(spark, root, "meta").get
      .as[String].head() === "old")
    // a part missing from the committed epoch reads as None, NOT as the
    // legacy layout or a torn stage
    assert(FullPipeline.readState(spark, root, "absent").isEmpty)
  }

  test("legacy bare-directory layout reads as a fallback") {
    val root = tmp()
    Seq(("A", 3.0)).toDF("symbol", "seed_close").write.parquet(s"$root/last_close")
    assert(FullPipeline.readState(spark, root, "last_close").get
      .as[(String, Double)].head() === ("A", 3.0))
    assert(FullPipeline.readState(spark, root, "atr_state").isEmpty)
  }

  test("epoch retention keeps the newest commits only") {
    val root = tmp()
    (1 to 4).foreach { i =>
      FullPipeline.commitState(spark, root, Map(
        "meta" -> Seq(Tuple1(i)).toDF("v")), retain = 2)
    }
    val epochs = new java.io.File(s"$root/state").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(epochs.length <= 3) // newest + up to `retain` older commits
    assert(FullPipeline.readState(spark, root, "meta").get.as[Int].head() === 4)
  }
}
