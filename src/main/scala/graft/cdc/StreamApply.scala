package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Per-key half-event for the streaming apply. */
case class HalfEvent(pk: Long, ord: Long, eff_op: String, value: Option[Double])

/** Streaming per-key replica state: one row per key (bounded state). */
case class KeyState(value: Option[Double], ord: Long, deleted: Boolean)

/** Emitted after each batch for each touched key. */
case class KeyUpdate(pk: Long, value: Option[Double], last_ord: Long, deleted: Boolean)

/** Structured Streaming CDC apply: the same upsert/delete/pk-change
  * semantics as the batch [[Apply]], maintained incrementally with
  * `flatMapGroupsWithState` — per-key state is exactly one row, so state
  * size is bounded by live-key cardinality regardless of stream length
  * (SURVEY.md §4). Truncate is a control-plane event (table-wide, not
  * keyed) and is excluded here; the batch oracle in the spec compares
  * against `Apply.latest` with truncates filtered accordingly.
  */
object StreamApply {
  private val applyFn: (Long, Iterator[HalfEvent], GroupState[KeyState]) => Iterator[KeyUpdate] =
    (pk, events, state) => {
      var st = state.getOption.getOrElse(KeyState(None, -1L, deleted = true))
      // events within a micro-batch arrive unordered — apply in ord order
      events.toSeq.sortBy(_.ord).foreach { e =>
        if (e.ord > st.ord) {
          st = if (e.eff_op == "d") KeyState(None, e.ord, deleted = true)
          else KeyState(e.value, e.ord, deleted = false)
        }
      }
      state.update(st)
      Iterator.single(KeyUpdate(pk, st.value, st.ord, st.deleted))
    }

  /** Run the streaming apply over the events parquet and return the final
    * materialized state (pk, value, last_ord) as a batch DataFrame.
    */
  def run(spark: SparkSession, dir: String, queryName: String = "graft_stream_apply"): DataFrame = {
    import spark.implicits._
    // schema must match the raw file (ts = nanos-as-long)
    val raw = Tables.load(spark, dir, "events")
    val stream = spark.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .transform(graft.Tables.normalizeEventsTs)
    val flat = Envelope.flat(stream).filter(col("op") =!= "t")
    val halves = Apply.halfEvents(flat).as[HalfEvent]
    val updates = halves
      .groupByKey(_.pk)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(applyFn)
    val q = updates.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable() finally q.stop()
    // last update per key across batches = final state
    spark.table(queryName)
      .groupBy(col("pk"))
      .agg(max("last_ord").as("last_ord"),
        max_by(col("deleted"), col("last_ord")).as("deleted"),
        max_by(col("value"), col("last_ord")).as("last_value"))
      .filter(!col("deleted"))
      .select(col("pk"), round(col("last_value"), 2).as("value"), col("last_ord"))
      .orderBy("pk")
  }
}
