package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole forked test JVM. */
object TestSpark {
  /** Fixture root for specs that read the driver-generated parquet —
    * overridable via TESTDATA_DIR so the suite runs on any machine
    * layout (tools/verify_all.sh reads the same variable). */
  val testdataDir: String = sys.env.getOrElse("TESTDATA_DIR", "/root/testdata")

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
