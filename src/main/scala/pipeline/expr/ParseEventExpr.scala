package pipeline.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Whole-event parse as ONE native Catalyst expression (url, text) → struct.
 *
 * Why: the Column-built Parse (pipeline.stages.Parse.columns) is correct but
 * pays per-field expression overhead — profiled at ~500µs/row (substring-cap
 * + regex split + 4 regexp_extracts + from_json, several re-evaluated) vs
 * ~3µs/row here. One pass: indexOf-based line split (no regex), compiled-once
 * field regexes, one Jackson parse, zero intermediate arrays. Semantics are
 * pinned to pipeline.ref.RefNormalizer (the executable spec) and spec-tested
 * equal to the Column formulation.
 *
 * Returns a struct:
 *   host, title, status, bytes, method, extracted_text, is_corrupt, has_json,
 *   norm: struct<ts timestamp, req_method, uri, resp_status int,
 *               body_bytes_sent long, response_length long, up_bytes_sent long>
 * `norm` applies the reference's empty-string→0 numeric coalescing
 * (`examples/nginx_json.conf:15-48`); null unless a valid nginx record is
 * present.
 */
case class ParseEventExpr(left: Expression, right: Expression,
                          maxLineLenKB: Int = 200)
    extends BinaryExpression {

  override def dataType: DataType = ParseEventExpr.schema
  override def nullable: Boolean = false
  // left = url, right = text

  /** Whole computation from child VALUES (null-tolerant) — shared by the
    * interpreted eval and the generated code. Public for codegen. */
  def compute(urlAny: Any, textAny: Any): InternalRow = {
    val url = if (urlAny == null) "" else urlAny.toString
    textAny match {
      case t: UTF8String if t.numBytes() <= maxLineLenKB * 1024 =>
        // fast path: no truncation possible (bytes >= chars), parse the
        // UTF-8 bytes directly — no full-text String decode
        ParseEventExpr.parseBytes(url, t.getBytes)
      case t: UTF8String =>
        ParseEventExpr.parse(url, t.toString, maxLineLenKB)
      case null =>
        ParseEventExpr.parse(url, "", maxLineLenKB)
    }
  }

  override def eval(input: InternalRow): Any =
    compute(left.eval(input), right.eval(input))

  /** Real codegen (not CodegenFallback): the surrounding operators stay in
    * whole-stage codegen and the call receives the children's generated
    * VALUES — no per-call InternalRow materialization + re-eval. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("parseEventExpr", this, classOf[ParseEventExpr].getName)
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val row = classOf[InternalRow].getName
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        final $row ${ev.value} = $ref.compute(
          ${l.isNull} ? null : ${l.value},
          ${r.isNull} ? null : ${r.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ParseEventExpr =
    copy(left = l, right = r)
}

object ParseEventExpr {

  val normSchema: StructType = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("req_method", StringType),
    StructField("uri", StringType),
    StructField("resp_status", IntegerType),
    StructField("body_bytes_sent", LongType),
    StructField("response_length", LongType),
    StructField("up_bytes_sent", LongType)))

  val schema: StructType = StructType(Seq(
    StructField("host", StringType),
    StructField("title", StringType),
    StructField("status", IntegerType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("method", StringType),
    StructField("extracted_text", StringType),
    StructField("is_corrupt", BooleanType, nullable = false),
    StructField("has_json", BooleanType, nullable = false),
    StructField("norm", normSchema)))

  private val StatusRe = java.util.regex.Pattern.compile("status=([0-9]+)")
  private val BytesRe = java.util.regex.Pattern.compile("bytes=([0-9]+)")
  private val MethodRe = java.util.regex.Pattern.compile("method=([A-Z]+)")

  private val mapperLocal =
    ThreadLocal.withInitial[com.fasterxml.jackson.databind.ObjectMapper](
      () => new com.fasterxml.jackson.databind.ObjectMapper())

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  private val TitlePrefix = "title: ".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Byte-level fast path (no truncation needed): scans `\n` positions in
    * the UTF-8 bytes (0x0A never occurs inside a multibyte sequence),
    * slices lines without decoding, regexes only the small kv line, and
    * feeds Jackson the json-line byte range directly. Same semantics as
    * [[parse]] — the line-split/field rules of RefNormalizer. */
  def parseBytes(url: String, b: Array[Byte]): InternalRow = {
    // up to 4 line ranges
    var e1 = -1; var e2 = -1; var e3 = -1; var e4 = -1
    var i = 0
    while (i < b.length && e4 < 0) {
      if (b(i) == '\n') {
        if (e1 < 0) e1 = i else if (e2 < 0) e2 = i
        else if (e3 < 0) e3 = i else e4 = i
      }
      i += 1
    }
    val l0s = 0; val l0e = if (e1 < 0) b.length else e1
    val l1s = if (e1 < 0) -1 else e1 + 1
    val l1e = if (e1 < 0) -1 else if (e2 < 0) b.length else e2
    val l2s = if (e2 < 0) -1 else e2 + 1
    val l2e = if (e2 < 0) -1 else if (e3 < 0) b.length else e3
    val l3s = if (e3 < 0) -1 else e3 + 1
    val l3e = if (e3 < 0) -1 else if (e4 < 0) b.length else e4

    def startsWithTitle: Boolean = {
      if (l0e - l0s < TitlePrefix.length) return false
      var k = 0
      while (k < TitlePrefix.length) {
        if (b(l0s + k) != TitlePrefix(k)) return false
        k += 1
      }
      true
    }
    val titleS = if (startsWithTitle) l0s + TitlePrefix.length else -1
    val titleLen = if (titleS < 0) 0 else l0e - titleS

    // kv line is small and ASCII — a String here is cheap
    val kv = if (l1s < 0) "" else new String(b, l1s, l1e - l1s,
      java.nio.charset.StandardCharsets.UTF_8)
    val mS = StatusRe.matcher(kv)
    val status = if (mS.find()) mS.group(1).toInt else 0
    val mB = BytesRe.matcher(kv)
    val bytes = if (mB.find()) mB.group(1).toLong else 0L
    val mM = MethodRe.matcher(kv)
    val method = if (mM.find()) mM.group(1) else ""

    val hasJson = l3s >= 0 && l3e > l3s && b(l3s) == '{'
    var corrupt = false
    var norm: InternalRow = null
    if (hasJson) {
      norm = streamNorm(b, l3s, l3e - l3s)
      corrupt = norm == null
    }

    // extracted_text = title + "\n" + body, assembled at byte level
    val bodyS = if (l2s < 0) 0 else l2s
    val bodyLen = if (l2s < 0) 0 else l2e - l2s
    val ext = new Array[Byte](titleLen + 1 + bodyLen)
    if (titleLen > 0) System.arraycopy(b, titleS, ext, 0, titleLen)
    ext(titleLen) = '\n'
    if (bodyLen > 0) System.arraycopy(b, bodyS, ext, titleLen + 1, bodyLen)

    InternalRow(
      Option(hostOf(url)).map(u).orNull,
      if (titleLen > 0) UTF8String.fromBytes(b, titleS, titleLen) else UTF8String.EMPTY_UTF8,
      status,
      bytes,
      u(method),
      UTF8String.fromBytes(ext),
      corrupt,
      hasJson,
      norm)
  }

  /**
   * Streaming-parser norm extraction (hot path): walks the record once with
   * Jackson's token stream — no tree allocation — pulling exactly the norm
   * fields. Returns null when the record is malformed or lacks `ts`
   * (same accept/reject set as readTree + hasNonNull("ts"), since both
   * require the full root object to tokenize cleanly). Duplicate keys:
   * last occurrence wins, matching readTree.
   */
  private def streamNorm(b: Array[Byte], off: Int, len: Int): InternalRow = {
    import com.fasterxml.jackson.core.JsonToken
    var ts: String = null
    var reqMethod: String = null; var uri: String = null
    var respStatus: Integer = null
    var bbs: String = null; var rl: String = null
    var upBytesSent: java.lang.Long = null
    try {
      val p = jsonFactory.createParser(b, off, len)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) return null
        var depth = 1
        // Category of the CURRENT depth-2 object (1=request 2=upstream
        // 3=response 9=other). Set only on the 1→2 transition and left
        // untouched while inside nested depth≥3 objects, so fields appearing
        // after a nested sibling (e.g. {"response":{"hdr":{},"status":500}})
        // still attribute to their section — matching readTree/buildNorm,
        // which only ever look at direct depth-2 children. Scalar reads below
        // all guard on depth == 2, so a stale value at other depths is inert.
        var section2 = 0
        while (depth > 0) {
          val t = p.nextToken()
          if (t == null) return null
          t match {
            case JsonToken.FIELD_NAME =>
              val f = p.currentName()
              val v = p.nextToken()
              // Duplicate keys: LAST occurrence wins INCLUDING null values,
              // matching readTree (a later binding replaces the earlier one
              // wholesale) — so bindings assign/reset rather than skip.
              // readTree re-binding corner cases, mirrored exactly:
              //  - "ts" bound to an object/array: asText() == "" → accepted
              //    with a null timestamp (not corrupt);
              //  - a section key re-bound to a scalar/array/null: its fields
              //    read as absent;
              //  - a section object re-entered: fields cleared first (a
              //    second {"request":{...}} must not inherit "method").
              def resetSection(sec: Int): Unit = sec match {
                case 1 => reqMethod = null; uri = null
                case 2 => rl = null; upBytesSent = null
                case 3 => respStatus = null; bbs = null
                case _ =>
              }
              def sectionOf(name: String): Int = name match {
                case "request" => 1
                case "upstream" => 2
                case "response" => 3
                case _ => 9
              }
              // A TRACKED FIELD bound to a container coerces like readTree:
              // asText(container) == "" and asInt/asLong(container) == 0 —
              // so {"response":{"status":[500]}} reads status 0 on BOTH
              // paths, not null-on-fast/0-on-slow.
              def coerceContainerField(): Unit =
                if (section2 == 1) {
                  if (f == "method") reqMethod = ""
                  else if (f == "uri") uri = ""
                } else if (section2 == 2) {
                  if (f == "response_length") rl = ""
                  else if (f == "bytes_sent") upBytesSent = java.lang.Long.valueOf(0L)
                } else if (section2 == 3) {
                  if (f == "status") respStatus = Integer.valueOf(0)
                  else if (f == "body_bytes_sent") bbs = ""
                }
              if (v == JsonToken.START_OBJECT) {
                depth += 1
                if (depth == 2) {
                  if (f == "ts") ts = ""
                  section2 = sectionOf(f)
                  resetSection(section2)
                } else if (depth == 3) {
                  coerceContainerField()
                }
              } else if (v == JsonToken.START_ARRAY) {
                if (depth == 1) {
                  if (f == "ts") ts = "" else resetSection(sectionOf(f))
                } else if (depth == 2) {
                  coerceContainerField()
                }
                p.skipChildren()
              } else {
                val isNull = v == JsonToken.VALUE_NULL
                if (depth == 1) {
                  if (f == "ts") ts = if (isNull) null else p.getText
                  else resetSection(sectionOf(f))
                } else if (depth == 2 && section2 == 1) {
                  if (f == "method") reqMethod = if (isNull) null else p.getText
                  else if (f == "uri") uri = if (isNull) null else p.getText
                } else if (depth == 2 && section2 == 2) {
                  if (f == "response_length") rl = if (isNull) null else p.getText
                  // getValueAsLong applies Jackson's string->number coercion,
                  // matching buildNorm's asLong on the slow path
                  else if (f == "bytes_sent")
                    upBytesSent = if (isNull) null else java.lang.Long.valueOf(p.getValueAsLong(0L))
                } else if (depth == 2 && section2 == 3) {
                  if (f == "status")
                    respStatus = if (isNull) null else Integer.valueOf(p.getValueAsInt(0))
                  else if (f == "body_bytes_sent") bbs = if (isNull) null else p.getText
                }
              }
            case JsonToken.END_OBJECT =>
              depth -= 1
            case _ => return null
          }
        }
      } finally p.close()
    } catch { case _: Exception => return null }
    if (ts == null) return null
    // numeric coercion must stay inside a guard: a non-long string here must
    // mark the row corrupt (null), exactly like the slow path's try around
    // buildNorm — not crash the job
    try {
      def coalesceNum(v: String): Long = if (v == null || v.isEmpty) 0L else v.toLong
      val micros = DateTimeUtils.stringToTimestamp(u(ts), java.time.ZoneOffset.UTC)
        .getOrElse(null)
      InternalRow(
        micros,
        if (reqMethod == null) null else u(reqMethod),
        if (uri == null) null else u(uri),
        respStatus,
        java.lang.Long.valueOf(coalesceNum(bbs)),
        java.lang.Long.valueOf(coalesceNum(rl)),
        upBytesSent)
    } catch { case _: NumberFormatException => null }
  }

  private val jsonFactory = {
    val f = new com.fasterxml.jackson.core.JsonFactory()
    f
  }

  private def buildNorm(node: com.fasterxml.jackson.databind.JsonNode): InternalRow = {
    val req = node.get("request")
    val up = node.get("upstream")
    val resp = node.get("response")
    def s(n: com.fasterxml.jackson.databind.JsonNode, f: String): String =
      if (n == null || !n.has(f) || n.get(f).isNull) null else n.get(f).asText()
    def coalesceNum(v: String): Long = if (v == null || v.isEmpty) 0L else v.toLong
    val micros = DateTimeUtils.stringToTimestamp(
      u(node.get("ts").asText()), java.time.ZoneOffset.UTC).getOrElse(null)
    InternalRow(
      micros,
      Option(s(req, "method")).map(u).orNull,
      Option(s(req, "uri")).map(u).orNull,
      if (resp != null && resp.hasNonNull("status")) Integer.valueOf(resp.get("status").asInt) else null,
      java.lang.Long.valueOf(coalesceNum(s(resp, "body_bytes_sent"))),
      java.lang.Long.valueOf(coalesceNum(s(up, "response_length"))),
      if (up != null && up.hasNonNull("bytes_sent")) java.lang.Long.valueOf(up.get("bytes_sent").asLong) else null)
  }

  /** Mirrors RefNormalizer.parse exactly; see that spec for semantics. */
  def parse(url: String, text0: String, maxLineLenKB: Int): InternalRow = {
    val maxChars = maxLineLenKB * 1024
    val text = if (text0.length > maxChars) text0.substring(0, maxChars) else text0

    // line split by scanning (limit 4 segments: title/kv/body/json-rest)
    val e1 = text.indexOf('\n')
    val line0 = if (e1 < 0) text else text.substring(0, e1)
    val e2 = if (e1 < 0) -1 else text.indexOf('\n', e1 + 1)
    val line1 = if (e1 < 0) "" else if (e2 < 0) text.substring(e1 + 1) else text.substring(e1 + 1, e2)
    val e3 = if (e2 < 0) -1 else text.indexOf('\n', e2 + 1)
    val line2 = if (e2 < 0) "" else if (e3 < 0) text.substring(e2 + 1) else text.substring(e2 + 1, e3)
    val e4 = if (e3 < 0) -1 else text.indexOf('\n', e3 + 1)
    val line3 = if (e3 < 0) "" else if (e4 < 0) text.substring(e3 + 1) else text.substring(e3 + 1, e4)

    val title = if (line0.startsWith("title: ")) line0.substring(7) else ""
    val mS = StatusRe.matcher(line1)
    val status = if (mS.find()) mS.group(1).toInt else 0
    val mB = BytesRe.matcher(line1)
    val bytes = if (mB.find()) mB.group(1).toLong else 0L
    val mM = MethodRe.matcher(line1)
    val method = if (mM.find()) mM.group(1) else ""

    val hasJson = line3.startsWith("{")
    var corrupt = false
    var norm: InternalRow = null
    if (hasJson) {
      try {
        val node = mapperLocal.get().readTree(line3)
        if (node == null || !node.isObject || !node.hasNonNull("ts")) corrupt = true
        else norm = buildNorm(node)
      } catch { case _: Exception => corrupt = true }
    }

    InternalRow(
      Option(hostOf(url)).map(u).orNull,
      u(title),
      status,
      bytes,
      u(method),
      u(title + "\n" + line2),
      corrupt,
      hasJson,
      norm)
  }

  /** RefNormalizer.host — scheme://host/... slice. */
  def hostOf(url: String): String = {
    val i = url.indexOf("://")
    if (i < 0) return null
    val rest = url.substring(i + 3)
    val j = rest.indexOf('/')
    if (j < 0) rest else rest.substring(0, j)
  }
}
