package pipeline.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The XML <System> block of a Windows event, relationally. */
final case class SystemBlock(
    Provider: String,
    EventID: Int,
    Level: Int,
    Channel: String,
    Computer: String)

/** One eventlog record: doc payload + eventlog metadata. */
final case class EventLogDoc(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String,
    system: SystemBlock,
    event_data: Map[String, String])

/**
 * Deterministic Windows-eventlog-shaped fixture (the reference's `eventlog`
 * source, `examples/windows/config_windows.json:3-27`): each record carries
 * a `system` struct (the XML <System> block: Provider/EventID/Level/Channel)
 * and an `event_data` map (the <EventData><Data Name=…> pairs) alongside the
 * doc payload, so XPath-compiled predicates (pipeline.config.XPathCompiler)
 * filter on exactly the shapes the reference's query strings address.
 *
 * Metadata is a pure function of row index i (same splitmix stream as
 * Webtext), so the single-threaded reference side of any test reconstructs
 * a record's metadata exactly.
 */
object EventLog {

  val Channels: IndexedSeq[String] = IndexedSeq(
    "Security", "System", "Microsoft-Windows-Sysmon/Operational",
    "Microsoft-Windows-PowerShell/Operational", "Windows PowerShell")

  val EventIds: IndexedSeq[Int] = IndexedSeq(4624, 4625, 4688, 7045, 1)

  def eventId(i: Long): Int = EventIds((Webtext.drawK(i, 60) % EventIds.size).toInt)
  def level(i: Long): Int = (Webtext.drawK(i, 63) % 4).toInt + 1
  def channelOf(i: Long): String = Channels((Webtext.drawK(i, 61) % Channels.size).toInt)
  def logonType(i: Long): Int = (Webtext.drawK(i, 62) % 5).toInt

  def record(i: Long): EventLogDoc = {
    val d = Webtext.row(i)
    EventLogDoc(
      url = d.url, warc_ts = d.warc_ts, html = null, text = d.text, lang = d.lang,
      system = SystemBlock(
        Provider = "Microsoft-Windows-Security-Auditing",
        EventID = eventId(i),
        Level = level(i),
        Channel = channelOf(i),
        Computer = s"host-${Webtext.drawK(i, 64) % 8}"),
      event_data = Map(
        "LogonType" -> logonType(i).toString,
        "TargetUserName" -> s"user${Webtext.drawK(i, 65) % 50}",
        "ProcessName" -> "C:\\Windows\\System32\\svchost.exe"))
  }

  /** Distributed, order-independent generation (each partition materializes
    * its own id range). `channel` (when given) restricts rows to one
    * configured channel, like the reference's per-channel subscription. */
  def df(spark: SparkSession, n: Long, partitions: Int = 4,
         channel: Option[String] = None): DataFrame = {
    import spark.implicits._
    val full = spark.range(0, n, 1, partitions)
      .map(i => record(i.longValue)).toDF()
    channel.fold(full)(c => full.filter(col("system.Channel") === c))
  }
}
