package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-profiling operator — the data-quality health check a pipeline
  * runs before trusting a new drop of data (row/null/distinct counts and
  * value ranges per column, one uniform row schema across heterogeneous
  * column types).
  *
  * Shape choice for scale: one COLUMN-PRUNED scan per profiled column
  * (the parquet reader materializes just that column), unioned —
  * deliberately NOT a single multi-distinct aggregate, which Catalyst
  * plans as an Expand that replicates every row once per distinct column
  * (k × corpus rows through one shuffle, all columns wide). k narrow
  * scans shuffle only each column's own values for its distinct count
  * and parallelize independently; total I/O is one full-table read
  * either way, but the shuffle volume drops from k×rows×width to
  * Σ per-column values.
  *
  * min/max are computed on the NATIVE type and cast to string AFTER —
  * a string min over a numeric column would be lexicographic. Distinct
  * counts are exact (count_distinct, nulls excluded), matching what a
  * governance check compares run-over-run.
  * Output: col_name, n_rows, n_nulls, n_distinct, min_val, max_val.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    cols.map { c =>
      df.select(col(c).as("v")).agg(
        count(lit(1)).as("n_rows"),
        coalesce(sum(when(col("v").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_nulls"),
        count_distinct(col("v")).as("n_distinct"),
        min(col("v")).cast("string").as("min_val"),
        max(col("v")).cast("string").as("max_val"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionAll _)
  }
}
