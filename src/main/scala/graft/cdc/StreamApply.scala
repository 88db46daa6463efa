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

/** Structured Streaming CDC apply: the same upsert/delete/pk-change/
  * TRUNCATE semantics as the batch [[Apply]], maintained incrementally
  * with `flatMapGroupsWithState` — per-key state is exactly one row, so
  * state size is bounded by live-key cardinality regardless of stream
  * length (SURVEY.md §4). Truncate is a control-plane event (table-wide,
  * not keyed), so it rides the SAME stream as a sentinel-key half-event
  * whose state folds the max truncate ord; the final snapshot drops
  * every key whose last update precedes that horizon — exactly the batch
  * `liveEvents` cut (`ord > tmax`), derived without a second source
  * pass. (r13: the c04-oracle conversion caught the previous
  * truncates-excluded behavior diverging at sf1, where the last truncate
  * lands late enough in the log to wipe most keys; at small sf every key
  * had post-truncate activity and the divergence was invisible.)
  */
object StreamApply {
  /** Sentinel pk carrying the truncate horizon through the keyed stream
    * (real pks are non-negative user-derived keys).
    */
  val TruncPk: Long = Long.MinValue

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
    val flat = Envelope.flat(stream)
    // truncates become sentinel-key half-events at the batch cut's ord
    // (lsn*2+1); applyFn folds them like any upsert, so the sentinel's
    // state ord IS the truncate horizon after any delivery order
    val truncs = flat.filter(col("op") === "t").select(
      lit(TruncPk).as("pk"), (col("lsn_long") * 2 + 1).as("ord"),
      lit("t").as("eff_op"), lit(null).cast("double").as("value"))
    val halves = Apply.halfEvents(flat.filter(col("op") =!= "t"))
      .select("pk", "ord", "eff_op", "value").unionByName(truncs)
      .as[HalfEvent]
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
    val snap = spark.table(queryName)
      .groupBy(col("pk"))
      .agg(max("last_ord").as("last_ord"),
        max_by(col("deleted"), col("last_ord")).as("deleted"),
        max_by(col("value"), col("last_ord")).as("last_value"))
    // the sentinel's final ord is the truncate horizon; a key survives
    // only if its last half-event is AFTER the last truncate (the batch
    // liveEvents `ord > tmax` cut) — 1-row broadcast, no second pass
    val horizon = snap.filter(col("pk") === TruncPk)
      .agg(coalesce(max("last_ord"), lit(-1L)).as("tmax"))
    snap.filter(col("pk") =!= TruncPk)
      .crossJoin(broadcast(horizon))
      .filter(!col("deleted") && col("last_ord") > col("tmax"))
      .select(col("pk"), round(col("last_value"), 2).as("value"), col("last_ord"))
      .orderBy("pk")
  }
}
