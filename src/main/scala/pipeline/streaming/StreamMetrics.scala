package pipeline.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

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
 *   {"batch_id":N,"query":"...","kind":"input|late|sink",
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
final class StreamMetrics(dir: String) {

  private val file: Path = Paths.get(dir, "stream_metrics.jsonl")
  Files.createDirectories(file.getParent)

  def append(batchId: Long, query: String, kind: String, name: String,
             rows: Long): Unit = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val line = s"""{"batch_id":$batchId,"query":"${esc(query)}","kind":"${esc(kind)}","name":"${esc(name)}","rows":$rows,"ts":"${java.time.Instant.now()}"}""" + "\n"
    Files.write(file, line.getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  def path: String = file.toString
}

object StreamMetrics {

  val schema: StructType = StructType(Seq(
    StructField("batch_id", LongType),
    StructField("query", StringType),
    StructField("kind", StringType),
    StructField("name", StringType),
    StructField("rows", LongType),
    StructField("ts", StringType)))

  /** The metrics table as a DataFrame (empty-safe). */
  def load(spark: SparkSession, dir: String): DataFrame = {
    val p = Paths.get(dir, "stream_metrics.jsonl")
    if (!Files.exists(p))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).json(p.toString)
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
    val m = new StreamMetrics(dir)
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
