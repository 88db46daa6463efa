package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q03_join_agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ cdc.CdcQueries.queries ++
      streaming.StreamingQueries.queries ++ ops.Dedup.queries ++
      ops.Similarity.queries ++ ops.TextAnalysis.queries ++
      ops.Multimodal.queries ++ sources.SourceSinks.queries ++
      Metrics.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ cdc.CdcQueries.oracle ++
      streaming.StreamingQueries.oracle ++ ops.Dedup.oracle ++
      ops.Similarity.oracle ++ ops.TextAnalysis.oracle ++
      ops.Multimodal.oracle ++ sources.SourceSinks.oracle ++
      Metrics.oracle
}
