package pipeline.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types._

/**
 * Queryable streaming metrics table — the streaming twin of the batch
 * path's observe()+ledger accounting (the reference exposes per-source/
 * sink counters as its ops surface, `examples/config.json:6-7`; round-3
 * streaming only LOGGED progress JSON, queryable nowhere).
 *
 * One JSON line per (micro-batch, metric) appended driver-side (the
 * Ledger pattern — listeners and foreachBatch both run on the driver):
 *
 *   {"seq":N,"batch_id":N,"query":"...","kind":"input|late|sink",
 *    "name":"...","rows":N,"ts":"..."}
 *
 *  - `input`: the observed `graft_stream_in` events_in of the micro-batch
 *    (from StreamingQueryProgress.observedMetrics — exact, computed
 *    during the batch, no second action);
 *  - `late`: Σ state-operator numRowsDroppedByWatermark — rows an
 *    event-time stateful op dropped this batch (0 when stateless);
 *  - `sink`: per-sink routed counts appended by the foreachBatch writer —
 *    the SAME numbers the ledger commits, so the two surfaces reconcile
 *    exactly (StreamingSpec asserts it).
 *
 * Load with [[StreamMetrics.load]]; `kind=sink` rows grouped by name must
 * equal the ledger's per-sink totals.
 */
final class StreamMetrics(dir: String,
    allowedKinds: Set[String] = StreamMetrics.SinkKinds) {

  import pipeline.io.Jsonl.esc

  private val file: Path = Paths.get(dir, "stream_metrics.jsonl")
  Files.createDirectories(file.getParent)

  // LAST-WINS semantics, the Ledger contract: every append carries a
  // strictly increasing `seq` (resumed from the file on construction, so
  // restarts keep ascending) and [[StreamMetrics.load]] keeps only the
  // highest-seq row per (batch_id, query, kind, name). A foreachBatch
  // re-execution after a mid-batch failure, a listener re-emission after
  // restart, or a full reprocess after a deleted checkpoint (batch ids
  // restarting at 0) each just supersede the older row — exactly how
  // Ledger.committedRows' unit-keyed toMap resolves its duplicates, so
  // the two surfaces cannot diverge on replay. (A write-side first-wins
  // dedup — the first round-4 design — silently dropped every row of a
  // reprocessed outDir and could collide distinct keys via its joined
  // string key.)
  private val SeqRe = """"seq":(\d+)""".r
  private var seq: Long =
    if (!Files.exists(file)) 0L
    else {
      var mx = -1L
      Files.readAllLines(file, UTF_8).forEach { l =>
        SeqRe.findFirstMatchIn(l).foreach(m => mx = math.max(mx, m.group(1).toLong))
      }
      mx + 1
    }

  /** ONE-WRITER-PER-KIND invariant: the last-wins load is deterministic
    * only because no two instances (with independent seq counters over one
    * shared file) ever write the same (batch, query, kind, name) key —
    * same-key rows from two writers could tie on seq. Each instance
    * therefore declares its kind space up front ([[StreamMetrics.SinkKinds]]
    * for the foreachBatch writer, [[StreamMetrics.ListenerKinds]] for the
    * progress listener — disjoint by construction) and `append` rejects
    * kinds outside it. */
  def append(batchId: Long, query: String, kind: String, name: String,
             rows: Long): Unit = synchronized {
    require(allowedKinds.contains(kind),
      s"StreamMetrics writer for kinds $allowedKinds got kind '$kind' — " +
        "one writer instance per kind space (see SinkKinds/ListenerKinds)")
    pipeline.io.Jsonl.appendLine(file,
      s"""{"seq":$seq,"batch_id":$batchId,"query":"${esc(query)}","kind":"${esc(kind)}","name":"${esc(name)}","rows":$rows,"ts":"${java.time.Instant.now()}"}""")
    seq += 1
  }

  def path: String = file.toString
}

object StreamMetrics {

  /** Kind space of the foreachBatch sink-count writer. */
  val SinkKinds: Set[String] = Set("sink")
  /** Kind space of the progress-listener writer ([[attach]]). */
  val ListenerKinds: Set[String] = Set("input", "late")

  val schema: StructType = StructType(Seq(
    StructField("seq", LongType),
    StructField("batch_id", LongType),
    StructField("query", StringType),
    StructField("kind", StringType),
    StructField("name", StringType),
    StructField("rows", LongType),
    StructField("ts", StringType)))

  /** The metrics table as a DataFrame (empty-safe): highest-seq row per
    * (batch_id, query, kind, name) — replayed/reprocessed rows supersede
    * their predecessors (last-wins, the Ledger contract). */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val p = Paths.get(dir, "stream_metrics.jsonl")
    if (!Files.exists(p))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("batch_id", "query", "kind", "name")
        .orderBy(org.apache.spark.sql.functions.col("seq").desc)
      spark.read.schema(schema).json(p.toString)
        .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(org.apache.spark.sql.functions.col("_rn") === 1)
        .drop("_rn")
    }
  }

  /**
   * Attach a progress listener feeding the metrics table: one `input` row
   * (observed events_in) and one `late` row (Σ numRowsDroppedByWatermark)
   * per micro-batch of every query on this session. Remove with
   * `spark.streams.removeListener` when done — listener delivery is
   * ASYNCHRONOUS (an event bus), so tests must await the expected rows,
   * not assume them on awaitTermination.
   */
  def attach(spark: SparkSession, dir: String): StreamingQueryListener = {
    val m = new StreamMetrics(dir, ListenerKinds)
    val l = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val qname = Option(p.name).getOrElse(p.id.toString)
        val obs = p.observedMetrics
        if (obs.containsKey("graft_stream_in"))
          m.append(p.batchId, qname, "input", "events_in",
            obs.get("graft_stream_in").getAs[Long]("events_in"))
        val late = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
        m.append(p.batchId, qname, "late", "dropped_by_watermark", late)
      }
    }
    spark.streams.addListener(l)
    l
  }
}
