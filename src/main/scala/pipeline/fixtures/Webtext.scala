package pipeline.fixtures

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import pipeline.model.WebDoc

/**
 * Deterministic webtext fixture generator (FIXTURES.md §1).
 *
 * Every row is a pure function of its index `i` and the fixed seed (42), via
 * a splitmix64 stream — so generation is order-independent and parallel
 * (each Spark partition generates its own id range; no driver-side loop),
 * and the single-threaded RefNormalizer can reconstruct any row exactly.
 *
 * Shape properties the tests rely on:
 *  - hot-domain skew: `hot.example.com` gets ~30% of rows (SURVEY.md §4.2);
 *  - the text embeds grok-extractable fields (title line; `status=… bytes=…
 *    method=…` key-values) and, on ~30% of rows, an nginx `json_combined`
 *    record per reference `examples/nginx_json.conf:50-79`;
 *  - ~1% of rows carry a corrupt (unterminated) JSON line → deadletter path;
 *  - ~2% of rows are exact duplicates of an earlier row's text (dedup ops);
 *  - `\n` newlines only, UTF-8; a fixed multibyte sample appears in titles.
 */
object Webtext {

  val Seed = 42L

  // ---- splitmix64: the one RNG, identical everywhere ----
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  /** k-th draw for row i; non-negative. */
  private def draw(i: Long, k: Int): Long = {
    val v = mix(mix(Seed ^ i) + k)
    v & Long.MaxValue
  }

  /** Public draw for sibling fixtures (EventLog metadata etc.) so every
    * fixture shares the one RNG stream. Draw slots 60+ are reserved for
    * non-Webtext fixtures. */
  def drawK(i: Long, k: Int): Long = draw(i, k)

  val HotDomain = "hot.example.com"
  val Domains: IndexedSeq[String] =
    HotDomain +: (1 to 49).map(k => f"site$k%02d.example.org")

  private val Words: IndexedSeq[String] = IndexedSeq(
    "spark", "scan", "merge", "join", "filter", "batch", "stream", "vector",
    "column", "row", "table", "query", "window", "agg", "sort", "hash",
    "data", "key", "value", "order", "group", "part", "line", "fast",
    "slow", "big", "small", "the", "a", "über", "naïve", "東京")

  private val Langs = IndexedSeq("en", "de", "fr", "es", "ja", "und")
  private val LangCum = IndexedSeq(40, 55, 70, 80, 90, 100) // cumulative %

  private val Methods = IndexedSeq("GET", "GET", "GET", "POST", "PUT", "DELETE")

  /** Zipf-ish tail weights for the 49 non-hot domains. */
  private val TailCum: IndexedSeq[Double] = {
    val w = (1 to 49).map(k => 1.0 / k)
    val s = w.sum
    w.map(_ / s).scanLeft(0.0)(_ + _).tail
  }

  private def pickDomain(i: Long): String = {
    if (draw(i, 0) % 100 < 30) HotDomain
    else {
      val u = (draw(i, 1) % 1000000).toDouble / 1000000.0
      val idx = TailCum.indexWhere(u < _) match { case -1 => 48; case k => k }
      Domains(idx + 1)
    }
  }

  private def pickLang(i: Long): String = {
    val p = (draw(i, 2) % 100).toInt
    Langs(LangCum.indexWhere(p < _))
  }

  def isCorrupt(i: Long): Boolean = draw(i, 3) % 100 == 0
  def hasJson(i: Long): Boolean = isCorrupt(i) || draw(i, 4) % 100 < 30
  /** ~2% of rows (i>=50) duplicate the text of row i/2 — exact-dup fixture. */
  def dupOf(i: Long): Option[Long] =
    if (i >= 50 && draw(i, 5) % 100 < 2) Some(i / 2) else None

  def status(i: Long): Int = {
    val p = draw(i, 6) % 100
    if (p < 80) 200 else if (p < 88) 404 else if (p < 95) 301
    else if (p < 98) 500 else 504
  }

  private def words(i: Long, k0: Int, n: Int): String =
    (0 until n).map(j => Words((draw(i, k0 + j) % Words.size).toInt))
      .mkString(" ")

  /** The embedded nginx `json_combined` line (reference
    * `examples/nginx_json.conf:50-79`). Deterministic; `response_length`
    * and `body_bytes_sent` are empty strings on ~20% of json rows to pin
    * the empty→0 coalescing rule (`nginx_json.conf:15-48`). */
  def nginxJson(i: Long): String = {
    if (isCorrupt(i)) return """{"ts":"2026-01-01T00:00:00Z","request":{"method":""" // unterminated
    val emptyNum = draw(i, 30) % 100 < 20
    val rl = if (emptyNum) "" else (draw(i, 31) % 100000).toString
    val bbs = if (emptyNum) "" else (draw(i, 32) % 100000).toString
    val uri = s"/p/${draw(i, 33) % 1000}"
    s"""{"ts":"${tsIso(i)}","remote_addr":"10.0.${draw(i, 34) % 256}.${draw(i, 35) % 256}",""" +
      s""""remote_user":"","request_time":${draw(i, 36) % 1000}.${draw(i, 37) % 100},""" +
      s""""request":{"http_referrer":"","http_user_agent":"graft-ua/${draw(i, 38) % 9}","method":"${method(i)}",""" +
      s""""scheme":"https","host":"${pickDomain(i)}","server_addr":"10.0.0.1","uri":"$uri",""" +
      s""""query":"","request_uri":"$uri","xfwd":""},""" +
      s""""upstream":{"addr":"10.1.0.${draw(i, 39) % 256}","bytes_received":${draw(i, 40) % 4096},""" +
      s""""bytes_sent":${draw(i, 41) % 65536},"response_time":${draw(i, 42) % 100}.${draw(i, 43) % 100},""" +
      s""""response_length":"$rl"},""" +
      s""""response":{"status":${status(i)},"body_bytes_sent":"$bbs"}}"""
  }

  def method(i: Long): String = Methods((draw(i, 7) % Methods.size).toInt)
  def bytesField(i: Long): Long = draw(i, 8) % 1000000

  private def tsMillis(i: Long): Long =
    // 2026-01-01T00:00:00Z + (i mod 30 days) minutes — bounded day span so
    // the (sink, day) write-partition count stays sane at any row count
    1767225600000L + (i % 43200L) * 60000L

  private def tsIso(i: Long): String =
    java.time.Instant.ofEpochMilli(tsMillis(i)).toString

  /** The full text payload of row i (before any dup redirection). */
  private def ownText(i: Long): String = {
    val title = s"title: ${words(i, 10, 5)}"
    val kv = s"status=${status(i)} bytes=${bytesField(i)} method=${method(i)}"
    val body = words(i, 20, 8 + (draw(i, 9) % 40).toInt)
    val base = s"$title\n$kv\n$body"
    if (hasJson(i)) s"$base\n${nginxJson(i)}" else base
  }

  def text(i: Long): String = dupOf(i).map(ownText).getOrElse(ownText(i))

  def url(i: Long): String = s"https://${pickDomain(i)}/p/${draw(i, 50) % 97}/$i"

  def row(i: Long): WebDoc = {
    val t = text(i)
    WebDoc(
      url = url(i),
      warc_ts = new Timestamp(tsMillis(i)),
      html = ("<html><body>" + t + "</body></html>").getBytes(UTF_8),
      text = t,
      lang = pickLang(i))
  }

  /** Distributed, order-independent generation: each partition materializes
    * its own id range; no driver loop, no shuffle. */
  def dataset(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[WebDoc] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).mapPartitions(_.map(i => row(i.longValue)))
  }

  def df(spark: SparkSession, n: Long, partitions: Int = 32): DataFrame =
    dataset(spark, n, partitions).toDF()

  // ---- enrichment dims (FIXTURES.md §2) ----

  val langMeta: Seq[(String, String, Boolean)] = Seq(
    ("en", "germanic", false), ("de", "germanic", false),
    ("fr", "romance", false), ("es", "romance", false),
    ("ja", "japonic", false), ("ar", "semitic", true),
    ("he", "semitic", true), ("zh", "sinitic", false),
    ("und", "unknown", false))

  def geo: Seq[(String, String, String)] =
    Domains.map { d =>
      val region = if (d == HotDomain) "us" else Seq("us", "eu", "apac")((d.hashCode.abs % 3))
      (d, region, d.substring(d.lastIndexOf('.') + 1))
    }

  def langMetaDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    langMeta.toDF("lang", "lang_family", "rtl")
  }

  def geoDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    geo.toDF("domain", "region", "tld")
  }
}
