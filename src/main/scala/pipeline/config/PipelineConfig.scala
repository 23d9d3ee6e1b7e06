package pipeline.config

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.json.JsonReadFeature
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/**
 * Job-config layer mirroring the reference's declared config semantics
 * (SURVEY.md §1.3, §2.3 T6):
 *
 *  - hujson tolerance: comments and trailing commas are legal
 *    (reference `examples/config.json:2-4` "parsed using hujson so you can
 *    use comments and trailing commas");
 *  - `$NAME` string values resolve from the environment at load
 *    (reference `examples/config.json:32-35`);
 *  - sources/destinations accept BOTH map-shaped and array-shaped
 *    declarations (`examples/config.json:5` vs `examples/mqtt_config.json:5`);
 *  - divergent key spellings for the same concept are accepted
 *    (`flushFreq`/`flushFrequency`, `bucketName` vs nested `bucket`).
 *
 * The config compiles to a [[PipelineSpec]]: named sources (fan-in),
 * routing rules (fan-out), named sinks with batch/flush bounds.
 */
final case class SourceSpec(
    id: String,
    kind: String,
    path: Option[String] = None,
    extension: Option[String] = None,
    maxLineLenKB: Option[Int] = None,
    query: Option[String] = None,
    grok: Option[String] = None,
    channel: Option[String] = None,
    topic: Option[String] = None,
    broker: Option[String] = None,
    qos: Option[Int] = None,
    retained: Option[Boolean] = None,
    // multiline record joining (our extension, the filebeat/logstash
    // `multiline` UX): true = continuation lines (indent / "Caused by:" /
    // "... N more", or a custom regex) rejoin their header line before
    // grok runs — stages.Multiline.joinDocs. Batch sources only.
    multiline: Option[Boolean] = None,
    multilineContinuation: Option[String] = None)

final case class SinkSpec(
    id: String,
    kind: String,
    pathPrefix: Option[String] = None,
    batchSize: Option[Int] = None,
    flushFreq: Option[String] = None,
    webhookUrl: Option[String] = None,
    topic: Option[String] = None,
    broker: Option[String] = None)

/** A routing rule: `when` is a tiny predicate DSL over parsed-event fields
  * (`field op value`, ops: == != >= > <= <; conjunction with &&), compiled
  * to a Catalyst Column by pipeline.stages.Route. Empty = always. */
final case class RuleSpec(when: String, sinks: Seq[String])

/** An ordered corpus-transform stage (our extension — the reference has no
  * processor pipeline between source and destination; these expose the
  * pipeline.ops corpus operators on the config surface). `kind` selects
  * the operator; `options` are its string-typed settings (env-expanded).
  * Compiled by [[TransformCompiler]]. */
final case class TransformSpec(kind: String, options: Map[String, String] = Map.empty)

/** Top-level `streamDedupNear` block (our extension): delivery-level
  * streaming NEAR-DUP dedup — compiles to
  * pipeline.Streaming.startDocsNearDedup in `--stream` mode. It sits at
  * the SINK side of the chain, not in `transforms`: the batch `dedup_near`
  * transform's transitive closure iterates driver-side and honestly
  * refuses streaming frames (TransformCompiler), so the streaming form is
  * a separate daemon with its documented approximations
  * (pipeline.streaming.NearDedup). `delayMs` is the watermark horizon —
  * parsed from a duration string ("1h", "30m", "10s", "500ms") so configs
  * read like the reference's flushFreq values.
  *
  * `mode` selects the signature family: "text" (MinHash LSH over word
  * shingles — nGram/bands/rowsPerBand) or "image" (64-bit dHash of the
  * binary `html` payload, banded hamming with the exact `bit_count(xor) ≤
  * maxHamming` verify — bands/maxHamming; compiles to
  * pipeline.Streaming.startImagesNearDedup). Keys belonging to the other
  * mode are rejected at load: a text option silently ignored under image
  * mode would change dedup recall without a trace. */
final case class StreamNearDedupSpec(
    delayMs: Long = 3600000L,
    nGram: Int = 3,
    bands: Int = 4,
    rowsPerBand: Int = 4,
    mode: String = "text",
    maxHamming: Int = 3)

final case class PipelineSpec(
    sources: Seq[SourceSpec],
    sinks: Seq[SinkSpec],
    rules: Seq[RuleSpec],
    transforms: Seq[TransformSpec] = Nil,
    streamDedupNear: Option[StreamNearDedupSpec] = None)

object PipelineConfig {

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(JsonReadFeature.ALLOW_JAVA_COMMENTS.mappedFeature(), true)
    m.configure(JsonReadFeature.ALLOW_TRAILING_COMMA.mappedFeature(), true)
    m
  }

  /** `"$NAME"` values resolve from the environment (verbatim reference
    * semantics: whole-value substitution, not interpolation). */
  def expandEnv(v: String, env: Map[String, String] = sys.env): String =
    if (v.startsWith("$")) env.getOrElse(v.substring(1), v) else v

  def parse(text: String, env: Map[String, String] = sys.env): PipelineSpec = {
    val root = mapper.readTree(text)

    def str(n: JsonNode, field: String): Option[String] =
      Option(n.get(field)).filterNot(_.isNull).map(x => expandEnv(x.asText(), env))
    // validated, env-expanded: Jackson's asInt() silently coerces any
    // non-numeric string (e.g. an unexpanded "$NAME") to 0, which would
    // turn maxLineLenKB/batchSize into destructive zeros
    def int(n: JsonNode, field: String): Option[Int] =
      Option(n.get(field)).filterNot(_.isNull).map { x =>
        if (x.isIntegralNumber) x.asInt()
        else {
          val s = expandEnv(x.asText(), env)
          s.toIntOption.getOrElse(throw new IllegalArgumentException(
            s"config field '$field' must be an integer, got: '$s'"))
        }
      }

    /** map-shaped {id: {...}} or array-shaped [{...}] with type as id. */
    def entries(node: JsonNode): Seq[(String, JsonNode)] =
      if (node == null) Nil
      else if (node.isArray)
        node.elements().asScala.zipWithIndex.map { case (n, i) =>
          str(n, "id").orElse(str(n, "type")).getOrElse(s"src$i") -> n
        }.toSeq
      else node.properties().asScala.map(e => e.getKey -> e.getValue).toSeq

    def bool(n: JsonNode, field: String): Option[Boolean] =
      Option(n.get(field)).filterNot(_.isNull).map(_.asBoolean())

    val sources = entries(root.get("sources")).map { case (id, n) =>
      SourceSpec(id,
        kind = str(n, "type").getOrElse("file"),
        path = str(n, "path"),
        extension = str(n, "extension"),
        maxLineLenKB = int(n, "maxLineLenKB"),
        query = str(n, "query"),
        grok = str(n, "grok"),
        channel = str(n, "channel"),
        topic = str(n, "topic"),
        broker = str(n, "broker"),
        qos = int(n, "qos"),
        retained = bool(n, "retained"),
        multiline = bool(n, "multiline"),
        multilineContinuation = str(n, "multilineContinuation").map { re =>
          // compile-time validation: a bad regex must fail config-shaped
          // at load, not deep inside a Catalyst rlike at runtime
          try { java.util.regex.Pattern.compile(re); re }
          catch {
            case e: java.util.regex.PatternSyntaxException =>
              throw new IllegalArgumentException(
                s"source '$id': multilineContinuation is not a valid regex: ${e.getMessage}")
          }
        })
    }
    val sinks = entries(root.get("destinations")).map { case (id, n) =>
      // s3b nests its s3 block (`examples/journald_to_s3batch_config.json:13-19`)
      val s3 = Option(n.get("s3"))
      SinkSpec(id,
        kind = str(n, "type").getOrElse(id),
        pathPrefix = str(n, "pathPrefix").orElse(str(n, "prefix"))
          .orElse(s3.flatMap(str(_, "pathPrefix"))),
        batchSize = int(n, "batchSize"),
        // both spellings, as in the reference
        flushFreq = str(n, "flushFreq").orElse(str(n, "flushFrequency")),
        webhookUrl = str(n, "webhookURL"),
        topic = str(n, "topic"),
        broker = str(n, "broker"))
    }
    val rules = Option(root.get("routing")).map(_.elements().asScala.map { n =>
      RuleSpec(
        when = str(n, "when").getOrElse(""),
        sinks = Option(n.get("sinks")).map(_.elements().asScala.map(_.asText()).toSeq)
          .getOrElse(Nil))
    }.toSeq).getOrElse(Nil)

    val transforms = Option(root.get("transforms"))
      .map(_.elements().asScala.map { n =>
        val kind = str(n, "type").getOrElse(throw new IllegalArgumentException(
          "each transforms entry needs a 'type'"))
        val opts = n.properties().asScala
          .filterNot(_.getKey == "type")
          .map { e =>
            // Jackson's asText() silently renders arrays/objects as "" and
            // JSON null as the string "null" — reject both config-shaped
            // (same reason as the int() helper)
            if (e.getValue.isContainerNode || e.getValue.isNull)
              throw new IllegalArgumentException(
                s"transform '$kind' option '${e.getKey}' must be a scalar " +
                  "string (write lists as comma-separated values)")
            e.getKey -> expandEnv(e.getValue.asText(), env)
          }.toMap
        TransformSpec(kind, opts)
      }.toSeq).getOrElse(Nil)

    val streamNd = Option(root.get("streamDedupNear")).map { n =>
      if (!n.isObject)
        throw new IllegalArgumentException(
          "streamDedupNear must be an object {delay, nGram, bands, rowsPerBand}")
      // reject unknown keys config-shaped: a typo ("rowPerBand") silently
      // falling back to the default would change dedup recall without a trace
      val known = Set("delay", "nGram", "bands", "rowsPerBand", "mode", "maxHamming")
      val unknown = n.properties().asScala.map(_.getKey).filterNot(known)
      if (unknown.nonEmpty)
        throw new IllegalArgumentException(
          s"streamDedupNear: unknown key(s) ${unknown.mkString(", ")} " +
            s"(expected: ${known.toSeq.sorted.mkString(", ")})")
      val mode = str(n, "mode").getOrElse("text")
      if (mode != "text" && mode != "image")
        throw new IllegalArgumentException(
          s"streamDedupNear.mode must be 'text' or 'image', got '$mode'")
      // cross-mode keys are rejected, not ignored (scaladoc above)
      val wrongMode =
        if (mode == "image") Seq("nGram", "rowsPerBand").filter(n.has)
        else Seq("maxHamming").filter(n.has)
      if (wrongMode.nonEmpty)
        throw new IllegalArgumentException(
          s"streamDedupNear: key(s) ${wrongMode.mkString(", ")} do not apply " +
            s"to mode '$mode'")
      def pos(field: String, default: Int): Int = {
        val v = int(n, field).getOrElse(default)
        if (v < 1) throw new IllegalArgumentException(
          s"streamDedupNear.$field must be >= 1, got $v")
        v
      }
      // image bands slice a 64-bit dHash — must divide 64 (the operator's
      // own require, surfaced config-shaped at load)
      val bands = pos("bands", if (mode == "image") 8 else 4)
      if (mode == "image" && 64 % bands != 0)
        throw new IllegalArgumentException(
          s"streamDedupNear.bands must divide 64 in image mode, got $bands")
      val maxHamming = int(n, "maxHamming").getOrElse(3)
      if (maxHamming < 0)
        throw new IllegalArgumentException(
          s"streamDedupNear.maxHamming must be >= 0, got $maxHamming")
      StreamNearDedupSpec(
        delayMs = str(n, "delay").map(parseDuration("streamDedupNear.delay", _))
          .getOrElse(3600000L),
        nGram = pos("nGram", 3),
        bands = bands,
        rowsPerBand = pos("rowsPerBand", 4),
        mode = mode,
        maxHamming = maxHamming)
    }

    PipelineSpec(sources, sinks, rules, transforms, streamNd)
  }

  private val DurationRe = """(\d+)\s*(ms|s|m|h|d)""".r

  /** "10s"/"30m"/"1h"/"500ms"/"2d" → milliseconds — the reference's
    * flushFreq spelling (`examples/stdin_to_s3_config.json:15` "10s"),
    * validated EAGERLY at config load with a config-shaped error (a bad
    * duration must not surface as an opaque Spark interval error at
    * stream start). */
  def parseDuration(field: String, s: String): Long = s.trim match {
    case DurationRe(n, unit) =>
      val mult = unit match {
        case "ms" => 1L; case "s" => 1000L; case "m" => 60000L
        case "h" => 3600000L; case "d" => 86400000L
      }
      n.toLong * mult
    case other => throw new IllegalArgumentException(
      s"$field: cannot parse duration '$other' (expected <n>ms|s|m|h|d, e.g. \"30m\")")
  }

  def load(path: String, env: Map[String, String] = sys.env): PipelineSpec =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8), env)

  /** Serialize a spec back to (plain, comment-free) JSON — canonical
    * map-shaped form. parse(render(spec)) == spec (round-trip-tested), so
    * programmatically-built pipelines can be persisted as configs. */
  def render(spec: PipelineSpec): String = {
    val m = mapper
    val root = m.createObjectNode()
    val srcs = root.putObject("sources")
    spec.sources.foreach { s =>
      val n = srcs.putObject(s.id)
      n.put("type", s.kind)
      s.path.foreach(n.put("path", _))
      s.extension.foreach(n.put("extension", _))
      s.maxLineLenKB.foreach(n.put("maxLineLenKB", _))
      s.query.foreach(n.put("query", _))
      s.grok.foreach(n.put("grok", _))
      s.channel.foreach(n.put("channel", _))
      s.topic.foreach(n.put("topic", _))
      s.broker.foreach(n.put("broker", _))
      s.qos.foreach(n.put("qos", _))
      s.retained.foreach(n.put("retained", _))
      s.multiline.foreach(n.put("multiline", _))
      s.multilineContinuation.foreach(n.put("multilineContinuation", _))
    }
    val dsts = root.putObject("destinations")
    spec.sinks.foreach { d =>
      val n = dsts.putObject(d.id)
      n.put("type", d.kind)
      d.pathPrefix.foreach(n.put("pathPrefix", _))
      d.batchSize.foreach(n.put("batchSize", _))
      d.flushFreq.foreach(n.put("flushFreq", _))
      d.webhookUrl.foreach(n.put("webhookURL", _))
      d.topic.foreach(n.put("topic", _))
      d.broker.foreach(n.put("broker", _))
    }
    if (spec.rules.nonEmpty) {
      val arr = root.putArray("routing")
      spec.rules.foreach { r =>
        val n = arr.addObject()
        n.put("when", r.when)
        val sk = n.putArray("sinks")
        r.sinks.foreach(sk.add)
      }
    }
    if (spec.transforms.nonEmpty) {
      val arr = root.putArray("transforms")
      spec.transforms.foreach { t =>
        val n = arr.addObject()
        n.put("type", t.kind)
        t.options.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k, v) }
      }
    }
    spec.streamDedupNear.foreach { nd =>
      val n = root.putObject("streamDedupNear")
      n.put("delay", s"${nd.delayMs}ms") // canonical ms form round-trips exactly
      n.put("mode", nd.mode)
      n.put("bands", nd.bands)
      if (nd.mode == "image") n.put("maxHamming", nd.maxHamming)
      else { n.put("nGram", nd.nGram); n.put("rowsPerBand", nd.rowsPerBand) }
    }
    m.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }
}

/** Compiles RuleSpec predicates to Catalyst Columns. Grammar (tiny, total):
  *   expr   := clause (' && ' clause)*
  *   clause := field op literal
  *   op     := == | != | >= | <= | > | <
  * Literals: ints, single-quoted strings, true/false. */
object RuleCompiler {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}

  private val Clause = """\s*(\w+)\s*(==|!=|>=|<=|>|<)\s*(.+?)\s*""".r

  private def literal(s: String): Column = s match {
    case "true" => lit(true)
    case "false" => lit(false)
    case q if q.startsWith("'") && q.endsWith("'") => lit(q.substring(1, q.length - 1))
    case n => lit(n.toLong)
  }

  def compile(when: String): Column =
    if (when.trim.isEmpty) lit(true)
    else when.split("&&").map {
      case Clause(f, op, v) =>
        val (c, l) = (col(f), literal(v))
        op match {
          case "==" => c === l
          case "!=" => c =!= l
          case ">=" => c >= l
          case "<=" => c <= l
          case ">" => c > l
          case "<" => c < l
        }
      case bad => throw new IllegalArgumentException(s"bad clause: '$bad'")
    }.reduce(_ && _)

  /** PipelineSpec routing → the Route stage's rule list. */
  def rules(spec: PipelineSpec): Seq[pipeline.stages.RouteRule] =
    spec.rules.flatMap(r => r.sinks.map(s =>
      pipeline.stages.RouteRule(compile(r.when), s)))
}
