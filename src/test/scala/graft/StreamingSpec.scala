package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingQueries

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("watermarked streaming agg equals batch tumbling agg") {
    val batch = StreamingQueries.s01_tumbling_window(spark, sf)
      .drop("n_users")
      .collect().map(_.toSeq).toSet
    val streamed = StreamingQueries.s05_watermark_agg(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }

  test("stream-stream interval join equals the batch interval join") {
    val batch = StreamingQueries.s07_interval_join(spark, sf)
      .collect().map(_.toSeq).toSet
    val streamed = StreamingQueries.s08_stream_stream_join(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("stateful counter equals the batch lifetime aggregate") {
    import org.apache.spark.sql.functions._
    val batch = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        max(unix_micros(col("ts"))).as("last_us"))
      .collect().map(_.toSeq).toSet
    val streamed = StreamingQueries.s09_stateful_counter(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("sessions are disjoint and ordered") {
    val rows = StreamingQueries.s02_sessionize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, sess) =>
      val sorted = sess.sortBy(_.getAs[Long]("session_idx"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // next session starts > 30 min after previous ends
          assert(b.getAs[Long]("start_us") - a.getAs[Long]("end_us") > 30L * 60 * 1000000)
        case _ =>
      }
    }
  }
}
