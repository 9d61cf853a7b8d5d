package graft

import graft.streaming.DedupStream
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-JOB profile of one gated-ingest batch — the fixed-cost
  * floor DedupScaleCheck measures is a sum of many small Spark jobs, and
  * this breaks a batch's wall time down by job callsite so the expensive
  * ones are named instead of guessed.
  *
  * Usage: runMain graft.IngestProfile [sfDir] [batches]
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class J(id: Int, site: String, start: Long, var end: Long = 0L)
    val jobs = collection.concurrent.TrieMap.empty[Int, J]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name.take(90)).getOrElse("?")
        jobs.put(js.jobId, J(js.jobId, site, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.get(je.jobId).foreach(_.end = je.time)
    })

    val base = Tables.documents(spark, sfDir).cache()
    val nBase = base.count()
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-prof").toString
    val stores = DedupStream.epochStores(s"$root/index")
    val bench = base.where(pmod(col("doc_id"), lit(97)) === 0)
    val gate = DedupStream.ContaminationGate(bench, s"$root/quarantine")
    val docGate = DedupStream.DocGate(s"$root/rejects", minQuality = 0.2,
      classifierThreshold = -1.0)
    (0 until nBatches).foreach { i =>
      jobs.clear()
      val slice = base.where(pmod(col("doc_id"), lit(nBatches)) === i)
      val t0 = System.nanoTime()
      DedupStream.processBatch(slice, stores, s"$root/pairs",
        n = 5, numPerms = 32, bands = 8, threshold = 0.5,
        gate = Some(gate), docGate = Some(docGate))
      val tb = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      stores.maintain(spark)
      val tm = (System.nanoTime() - t1) / 1e9
      val done = jobs.values.toSeq.filter(_.end > 0).sortBy(_.id)
      println(f"[ingest-prof] batch=$i wall=$tb%.2f s maintain=$tm%.2f s jobs=${done.size} " +
        f"jobSum=${done.map(j => j.end - j.start).sum / 1e3}%.2f s")
      var prevEnd = 0L
      done.foreach { j =>
        val gap = if (prevEnd == 0) 0.0 else (j.start - prevEnd) / 1e3
        prevEnd = j.end
        println(f"[ingest-prof]   job=${j.id}%-4d dur=${(j.end - j.start) / 1e3}%6.2f s gapBefore=$gap%6.2f s ${j.site}")
      }
    }
    spark.stop()
  }
}
