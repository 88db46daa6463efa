package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.util.QueryExecutionListener

/** Operational metrics — the Spark analogue of the reference's per-table /
  * per-op Prometheus counters and snapshot progress gauges
  * (creek internal/metrics/metrics.go:1-149). Where creek counts rows and
  * messages as they flow through the replication daemon, a Spark pipeline
  * observes the same numbers through a [[QueryExecutionListener]]: after
  * each action the EXECUTED plan carries the true row/record counters
  * (scan output rows, shuffle records written, per-operator output rows)
  * in its SQLMetric registry — measured, not estimated.
  *
  * [[profile]] registers a listener, drives each target query, waits for
  * its QueryExecution to arrive on the listener bus (metrics are only
  * final then), and emits one counter row per query — the table a
  * monitoring pipeline would scrape.
  */
object Metrics {
  private type Q = (SparkSession, String) => DataFrame

  case class QueryMetrics(query: String, action: String, rows_out: Long,
    scan_rows: Long, shuffle_records: Long, n_scans: Long, n_exchanges: Long)

  /** Flatten the executed plan, descending through AQE wrappers and
    * materialized query stages to the operators that actually ran.
    * (Also the plan walker behind every plan-shape test assertion.)
    */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case q: QueryStageExec => q +: allNodes(q.plan)
    case other => other +: other.children.flatMap(allNodes)
  }

  def profile(s: SparkSession, targets: Seq[(String, DataFrame)]): DataFrame = {
    import s.implicits._
    val captured = new java.util.concurrent.ConcurrentHashMap[QueryExecution, String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        captured.put(qe, funcName)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    try {
      val rows = targets.map { case (name, df) =>
        captured.clear()
        // a single global-count row — the result cardinality without
        // shipping result rows to the driver (at 100 TB the profiled
        // query's own result can be huge); the count's executed plan still
        // carries the full child pipeline, so every scan/shuffle counter
        // is observed. collect() runs on THIS dataset's QueryExecution, so
        // the listener wait below matches by object identity — a stale
        // event from an earlier action on the async bus cannot be
        // misattributed the way a funcName scan could.
        val cnt = df.groupBy().count()
        val qe = cnt.queryExecution
        val nOut = cnt.collect().head.getLong(0)
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (!captured.containsKey(qe) && System.nanoTime() < deadline)
          Thread.sleep(10)
        require(captured.containsKey(qe), s"listener never observed $name")
        val nodes = allNodes(qe.executedPlan)
        val scans = nodes.collect { case f: FileSourceScanExec => f }
        val shuffles = nodes.collect { case e: ShuffleExchangeLike => e }
        QueryMetrics(name, "count", nOut,
          scans.flatMap(_.metrics.get("numOutputRows")).map(_.value).sum,
          shuffles.flatMap(_.metrics.get("shuffleRecordsWritten")).map(_.value).sum,
          scans.size.toLong, shuffles.size.toLong)
      }
      s.createDataset(rows).toDF().orderBy("query")
    } finally s.listenerManager.unregister(listener)
  }

  // x06 (rows-only; spec: counters positive, deterministic, rows_out
  // cross-checked): per-query execution counters for three representative
  // pipeline queries — an aggregation, the CDC apply, and a dedup.
  val x06_query_metrics: Q = (s, d) =>
    profile(s, Seq(
      "q01_pricing_agg" -> ops.Relational.q01_pricing_agg(s, d),
      "c04_apply_latest" -> cdc.CdcQueries.c04_apply_latest(s, d),
      "d01_exact_dedup" -> ops.Dedup.d01_exact_dedup(s, d)))

  /** Melt a wide gauge frame into Prometheus long format:
    * (family, metric, instance, value) — one row per sample.
    */
  private def melt(df: DataFrame, family: String, instance: Column,
      metrics: Seq[String]): DataFrame =
    df.select(lit(family).as("family"), instance.cast("string").as("instance"),
      explode(map(metrics.flatMap(m =>
        Seq(lit(m), col(m).cast("long"))): _*)).as(Seq("metric", "value")))

  // x20 (rows-only; spec: all three families present, lossless sink
  // roundtrip, values conserved vs the source gauges): the unified
  // operational-metrics SINK — the Spark-deployment analogue of creek's
  // Prometheus registry (internal/metrics/metrics.go:20-60 registers
  // producer/consumer counters and lag gauges on one HTTP endpoint;
  // a zero-egress Spark pipeline lands the same samples as files a
  // node-exporter textfile collector or scraper picks up). The three
  // gauge families this library computes — x06 per-query execution
  // counters, x09 per-micro-batch streaming progress, x14 replication
  // lag — normalize into ONE long-format table
  // (family, metric, instance, value), land as JSON-lines, and read
  // back losslessly. Metric cardinality is bounded (queries×5 +
  // micro-batches×4 + keepalives×2), so the sink costs nothing at any
  // corpus size — like the registry it mirrors, it scales with the
  // TOPOLOGY, not the data.
  val x20_metrics_sink: Q = (s, d) => {
    val samples =
      melt(x06_query_metrics(s, d), "query", col("query"),
        Seq("rows_out", "scan_rows", "shuffle_records", "n_scans", "n_exchanges"))
      .unionByName(melt(streaming.StreamMetrics.x09_stream_progress(s, d),
        "stream", col("batch_id"),
        Seq("num_input_rows", "state_rows_total", "state_rows_updated",
          "n_state_operators")))
      .unionByName(melt(cdc.CdcQueries.x14_replication_lag(s, d),
        "replication", col("wal_lsn_str"),
        Seq("behind_lsn", "behind_time_ms")))
    val dir = java.nio.file.Files.createTempDirectory("graft_metrics")
    try {
      samples.write.mode("overwrite").json(s"$dir/scrape")
      val back = s.read.schema(samples.schema).json(s"$dir/scrape")
        .orderBy("family", "metric", "instance")
      // bounded materialization (metric rows, not data rows), then the
      // scratch dies with the call
      import scala.jdk.CollectionConverters._
      s.createDataFrame(back.collect().toSeq.asJava, back.schema)
    } finally graft.sources.SourceSinks.deleteDir(dir)
  }

  val queries: Map[String, Q] = Map(
    "x06_query_metrics" -> x06_query_metrics,
    "x20_metrics_sink" -> x20_metrics_sink,
    "x09_stream_progress" -> (streaming.StreamMetrics.x09_stream_progress _))
  val oracle: Map[String, String] = Map.empty
}
