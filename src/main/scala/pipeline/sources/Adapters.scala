package pipeline.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import pipeline.fixtures.Webtext

/**
 * Wire codec for line-shaped sources (file / scanner / journald): one event
 * per line, JSON-encoded — the shape log shippers actually emit (journald's
 * `-o json`, kubernetes container logs). Decode is `from_json` with an
 * explicit schema; encode exists for fixtures/tests and round-trips exactly
 * (newlines inside `text` are JSON-escaped, so one event is always one line).
 */
object LineCodec {

  /** Doc wire schema: the webtext input-hint minus `html` (line shippers
    * carry text payloads; binary never rides a line protocol). */
  val wire: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  def encode(docs: DataFrame): DataFrame =
    docs.select(to_json(struct(
      col("url"), col("warc_ts"), col("text"), col("lang"))).as("value"))

  /** Lines → doc shape. Undecodable lines keep url null and land in the
    * deadletter path downstream rather than vanishing. */
  def decode(lines: DataFrame, valueCol: String = "value"): DataFrame =
    lines
      .withColumn("_doc", from_json(col(valueCol), wire))
      .select(col("_doc.url").as("url"), col("_doc.warc_ts").as("warc_ts"),
        lit(null).cast(BinaryType).as("html"),
        col("_doc.text").as("text"), col("_doc.lang").as("lang"))

  /**
   * Journald fielded decode: a journald entry is a flat key→value record
   * (`journalctl -o json`: MESSAGE, PRIORITY, _SYSTEMD_UNIT, …), so besides
   * the doc shape the FULL record rides along as `entries
   * map<string,string>` — the same addressable shape as Windows EventData
   * (`examples/windows/README.md:169`), so `element_at(entries, 'KEY')`
   * filters and per-field grok work exactly like eventlog's
   * `EventData['K']`. ONE Jackson parse per line: the doc columns project
   * out of the map (two from_json calls with different schemas would NOT
   * collapse — they are distinct expression trees, so each would re-parse).
   * Undecodable lines null everything (deadletter path downstream);
   * a malformed timestamp VALUE nulls that field only (try_to_timestamp),
   * matching from_json's PERMISSIVE per-field behavior.
   */
  def decodeJournald(lines: DataFrame, valueCol: String = "value"): DataFrame =
    lines
      .withColumn("entries",
        from_json(col(valueCol), MapType(StringType, StringType)))
      .select(
        try_element_at(col("entries"), lit("url")).as("url"),
        call_function("try_to_timestamp",
          try_element_at(col("entries"), lit("warc_ts"))).as("warc_ts"),
        lit(null).cast(BinaryType).as("html"),
        try_element_at(col("entries"), lit("text")).as("text"),
        try_element_at(col("entries"), lit("lang")).as("lang"),
        col("entries"))
}

/**
 * S5: message-bus source adapter (the reference's mqtt source,
 * `examples/mqtt_config.json:5-15` — broker/topic/qos/retained). The batch
 * AND streaming form share one message shape: Kafka's source schema plus
 * the MQTT fields, so the same decode runs under `read` and `readStream`
 * (a real cluster binds `spark.readStream.format("kafka")` here; the
 * sandbox has no broker, so fixtures/tests supply frames of this shape).
 */
object Bus {

  /** Bus message schema (kafka-source-compatible column names). */
  val message: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("timestamp", TimestampType),
    StructField("qos", IntegerType),
    StructField("retained", BooleanType)))

  /**
   * Messages → doc shape + bus provenance metadata columns
   * (`bus_topic`/`bus_qos`/`bus_retained` ride along for per-source
   * accounting, mirroring the reference keeping broker metadata on events).
   * `topic` filters to the subscribed topic when given — pushed to the
   * scan/broker like a subscription, not evaluated post-hoc.
   */
  def decodeDocs(messages: DataFrame, topic: Option[String] = None): DataFrame = {
    val subscribed = topic.fold(messages)(t => messages.filter(col("topic") === t))
    subscribed
      .withColumn("_doc", from_json(col("value"), LineCodec.wire))
      .select(col("_doc.url").as("url"), col("_doc.warc_ts").as("warc_ts"),
        lit(null).cast(BinaryType).as("html"),
        col("_doc.text").as("text"), col("_doc.lang").as("lang"),
        col("topic").as("bus_topic"), col("qos").as("bus_qos"),
        col("retained").as("bus_retained"))
  }

  /** Deterministic bus-message fixture wrapping the Webtext docs: row i is
    * published on `topic` with offset = i (recovered from the fixture url,
    * like real per-partition log offsets are dense), partition = i mod
    * `partitions`, timestamp = the doc's event time — every field is a pure
    * function of i, so snapshots/replays are bit-stable across runs. */
  def fixture(spark: SparkSession, n: Long, topic: String,
              partitions: Int = 4): DataFrame = {
    val docs = Webtext.df(spark, n, partitions)
    val i = regexp_extract(col("url"), "/([0-9]+)$", 1).cast("long")
    docs.select(
      to_json(struct(col("url"), col("warc_ts"), col("text"), col("lang"))).as("value"),
      col("warc_ts").as("timestamp"), i.as("offset"))
      .withColumn("topic", lit(topic))
      .withColumn("partition", pmod(col("offset"), lit(partitions)).cast("int"))
      .withColumn("key", lit(null).cast("string"))
      .withColumn("qos", lit(1))
      .withColumn("retained", lit(false))
      .select(message.fieldNames.map(col).toSeq: _*)
  }
}
