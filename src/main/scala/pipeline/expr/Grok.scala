package pipeline.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Grok named-pattern library — the normalizer plugin point (SURVEY.md §7.4;
 * the reference's T1 "event normalizers", `examples/nginx_json.conf:50-79`
 * being one hand-written instance). A grok expression interleaves literal
 * regex with `%{PATTERN:field}` / `%{PATTERN:field:type}` / `%{PATTERN}`
 * references into a base dictionary, and compiles to ONE regex whose
 * capture groups are exactly the named fields, in order — so extraction is
 * a single pass per row producing a typed struct (vs one `regexp_extract`
 * scan per field).
 *
 * Dialect: the dictionary (and any user literals, by documented contract)
 * sticks to the RE2 ∩ java.util.regex common subset — character classes,
 * alternation, non-capturing groups, greedy/lazy quantifiers; no backrefs,
 * no lookaround (SURVEY.md §7.5: the reference's Go side is RE2). That keeps
 * patterns portable to the DuckDB oracle (also RE2), which addresses field
 * k as capture group k of [[Grok.compile]]'s expanded regex.
 *
 * Types: `:int` `:long` `:double` `:boolean` (default string). A matched
 * field that fails its numeric parse nulls THAT field, never the row —
 * the empty-string→0 style coalescing stays a visible downstream choice.
 */
object Grok {

  /** Base pattern dictionary. Every entry is group-free (non-capturing
    * only), so capture-group numbering is owned by the field references. */
  val Patterns: Map[String, String] = Map(
    "WORD" -> "\\w+",
    "NOTSPACE" -> "\\S+",
    "SPACE" -> "\\s+",
    "DATA" -> ".*?",
    "GREEDYDATA" -> ".*",
    "INT" -> "[+-]?[0-9]+",
    "NUMBER" -> "[+-]?[0-9]+(?:\\.[0-9]+)?",
    "BASE16NUM" -> "(?:0[xX])?[0-9a-fA-F]+",
    "IPV4" -> "(?:[0-9]{1,3}\\.){3}[0-9]{1,3}",
    "IP" -> "(?:[0-9]{1,3}\\.){3}[0-9]{1,3}",
    "HOSTNAME" -> "[A-Za-z0-9][A-Za-z0-9._-]*",
    "USER" -> "[a-zA-Z0-9._-]+",
    // single quantifier: the inner class already matches '/', so one
    // /[^ ?\n]* covers multi-segment paths — the nested (?:/...)+ form is an
    // ambiguous quantifier that backtracks catastrophically in java.util.regex
    // on adversarial non-matching lines (RE2 on the oracle side is immune,
    // so runtime cost would also diverge between engines)
    "PATH" -> "/[^ ?\\n]*",
    "URIPARAM" -> "\\?[^ \\n]*",
    "QUOTEDSTRING" -> "\"[^\"]*\"",
    "UUID" -> "[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "LOGLEVEL" -> "(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERR(?:OR)?|CRIT(?:ICAL)?|FATAL|SEVERE)",
    "TIMESTAMP_ISO8601" ->
      "[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}:[0-9]{2}(?:\\.[0-9]+)?(?:Z|[+-][0-9]{2}:?[0-9]{2})?",
    "SYSLOGTIMESTAMP" -> "[A-Z][a-z]{2} [ 0-9][0-9] [0-9]{2}:[0-9]{2}:[0-9]{2}",
    "HTTPMETHOD" -> "(?:GET|POST|PUT|DELETE|HEAD|OPTIONS|PATCH|TRACE|CONNECT)",
    // ---- classic composed line formats (grok convention: dictionary
    // entries may carry NAMED references; their fields surface on the
    // caller's struct in group order) ----
    "MONTH" -> "\\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\\b",
    "MONTHDAY" -> "(?:0[1-9]|[12][0-9]|3[01]|[1-9])",
    "YEAR" -> "[0-9]{4}",
    "TIME" -> "[0-9]{2}:[0-9]{2}:[0-9]{2}",
    "HTTPDATE" -> "%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "IPORHOST" -> "(?:%{IPV4}|%{HOSTNAME})",
    // HTTPD common log line (the format a log pipeline meets daily; the
    // reference's nginx conf is the JSON twin, `examples/nginx_json.conf:50-79`)
    "COMMONAPACHELOG" ->
      ("%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \\[%{HTTPDATE:timestamp}\\] " +
        "\"%{HTTPMETHOD:verb} %{NOTSPACE:request} HTTP/%{NUMBER:httpversion}\" " +
        "%{INT:response:int} (?:%{INT:bytes:long}|-)"),
    "COMBINEDAPACHELOG" ->
      "%{COMMONAPACHELOG} \"%{DATA:referrer}\" \"%{DATA:agent}\"",
    // full RFC3164-ish syslog line (program[pid]: message; pid optional).
    // PROG excludes '[' / ':' so the optional pid bracket is unambiguous
    // (a \S+ program would swallow "[pid]:" and force backtracking).
    "PROG" -> "[A-Za-z0-9._/-]+",
    "SYSLOGLINE" ->
      ("%{SYSLOGTIMESTAMP:sl_ts} %{NOTSPACE:logsource} %{PROG:program}" +
        "(?:\\[%{INT:pid:int}\\])?: %{GREEDYDATA:message}"),
    // RFC 5424 structured syslog: <PRI>VER TS HOST APP PROCID MSGID SD MSG.
    // Nilable fields ('-') use a leading '-' alternative — leftmost-first
    // submatch semantics agree between java.util.regex and RE2, so a nil
    // leaves the named group non-participating on both engines.
    // HAProxy HTTP log (the haproxy docs' httplog format): client,
    // accept date, frontend/backend/server, the five timer fields, status,
    // bytes, cookies, termination state, the four conn counters + retries,
    // queues, and the quoted request line.
    "HAPROXYDATE" -> "%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME}\\.[0-9]{3}",
    "HAPROXYHTTPLINE" ->
      ("%{IPV4:ha_client_ip}:%{INT:ha_client_port:int} " +
        "\\[%{HAPROXYDATE:ha_accept_date}\\] %{NOTSPACE:ha_frontend} " +
        "%{NOTSPACE:ha_backend}/%{NOTSPACE:ha_server} " +
        "%{INT:ha_tq:int}/%{INT:ha_tw:int}/%{INT:ha_tc:int}/" +
        "%{INT:ha_tr:int}/%{INT:ha_tt:int} %{INT:ha_status:int} " +
        "%{INT:ha_bytes:long} %{NOTSPACE:ha_req_cookie} " +
        "%{NOTSPACE:ha_resp_cookie} %{NOTSPACE:ha_term_state} " +
        "%{INT:ha_actconn:int}/%{INT:ha_feconn:int}/%{INT:ha_beconn:int}/" +
        "%{INT:ha_srvconn:int}/%{INT:ha_retries:int} " +
        "%{INT:ha_srv_queue:int}/%{INT:ha_backend_queue:int} " +
        "\"%{DATA:ha_request}\""),
    // the nil '-' alternatives live OUTSIDE the named references: a nil
    // must leave the group non-participating (null field), not capture "-"
    "SYSLOG5424SD" -> "(?:\\[[^\\]]+\\])+",
    "SYSLOG5424LINE" ->
      ("<%{INT:s5_pri:int}>%{INT:s5_ver:int} %{TIMESTAMP_ISO8601:s5_ts} " +
        "%{NOTSPACE:s5_host} %{NOTSPACE:s5_app} (?:-|%{NOTSPACE:s5_proc}) " +
        "%{NOTSPACE:s5_msgid} (?:-|%{SYSLOG5424SD:s5_sd}) %{GREEDYDATA:s5_msg}"),
    // ---- PostgreSQL server log: the stock `log_line_prefix = '%m [%p] '`
    // shape (millisecond timestamp + TZ abbreviation + backend pid),
    // optionally `user@database ` (the '%u@%d ' prefix amendment admins
    // add first), then the level-tagged message. The optional user@db
    // group nils BOTH fields on system/background lines.
    "DATESTAMP_PG" -> "%{YEAR}-[0-9]{2}-[0-9]{2} %{TIME}\\.[0-9]{3}",
    // abbreviation (UTC/CEST) or the numeric offset postgres's %m stamps
    // for zones WITHOUT an abbreviation (log_timezone=Asia/Kathmandu →
    // '+0545') — abbreviation-only would null every field of such logs
    "TZ" -> "(?:[A-Z]{2,5}|[+-][0-9]{2,4})",
    "PGLEVEL" ->
      "(?:DEBUG[1-5]?|INFO|NOTICE|WARNING|ERROR|LOG|FATAL|PANIC|STATEMENT|DETAIL|HINT|CONTEXT)",
    "POSTGRESQLLOG" ->
      ("%{DATESTAMP_PG:pg_ts} %{TZ:pg_tz} \\[%{INT:pg_pid:int}\\] " +
        "(?:%{USER:pg_user}@%{PROG:pg_db} )?%{PGLEVEL:pg_level}:\\s+" +
        "%{GREEDYDATA:pg_message}"),
    // ---- Java application logs. SINGLE-LINE CONTRACT (documented): every
    // source in this pipeline delivers one event per row (journald/file/
    // scanner are line-oriented), so a multi-line throwable arrives as its
    // header row plus one row PER FRAME — JAVATHROWABLE parses the header,
    // JAVASTACKTRACEPART each `at ...` frame; re-associating frames with
    // their header is a downstream stateful concern (sessionize-by-pid),
    // deliberately NOT folded into the regex (a joining regex would need
    // multi-line records the sources never produce).
    "JAVACLASS" -> "(?:[a-zA-Z$_][a-zA-Z$_0-9]*\\.)+[a-zA-Z$_][a-zA-Z$_0-9]*",
    "JAVAMETHOD" -> "(?:<(?:cl)?init>|[a-zA-Z$_][a-zA-Z$_0-9]*)",
    "JAVAFILE" -> "[A-Za-z0-9_$.-]+",
    "JAVASTACKTRACEPART" ->
      ("\\s*at %{JAVACLASS:jst_class}\\.%{JAVAMETHOD:jst_method}" +
        "\\((?:Native Method|Unknown Source|%{JAVAFILE:jst_file}(?::%{INT:jst_line:int})?)\\)"),
    "JAVATHROWABLE" ->
      "(?:Caused by: )?%{JAVACLASS:jt_exception}(?::\\s+%{GREEDYDATA:jt_message})?",
    // log4j/logback default-ish pattern: ts [thread] LEVEL logger - message
    "LOG4JLINE" ->
      ("%{TIMESTAMP_ISO8601:l4_ts} \\[%{DATA:l4_thread}\\] %{LOGLEVEL:l4_level}\\s+" +
        "%{JAVACLASS:l4_logger} - %{GREEDYDATA:l4_message}"))

  final case class Field(name: String, typ: String) {
    def dataType: DataType = typ match {
      case "int" => IntegerType
      case "long" => LongType
      case "double" | "float" => DoubleType
      case "boolean" => BooleanType
      case _ => StringType
    }
  }

  /** The expanded single regex + the captured fields in group order
    * (field i ↔ capture group i+1). */
  final case class Compiled(regex: String, fields: Seq[Field]) {
    def schema: StructType =
      StructType(fields.map(f => StructField(f.name, f.dataType)))
  }

  private val Ref = java.util.regex.Pattern.compile(
    "%\\{(\\w+)(?::([\\w@.\\[\\]-]+))?(?::(\\w+))?\\}")

  /**
   * Expand `%{...}` references (recursively — a custom pattern may itself
   * reference others) into one regex. Named references become capture
   * groups; unnamed ones non-capturing. Literal text between references is
   * passed through VERBATIM as regex, classic grok semantics.
   */
  def compile(pattern: String,
              extraPatterns: Map[String, String] = Map.empty,
              depth: Int = 0): Compiled = {
    require(depth < 10, s"grok pattern recursion too deep: $pattern")
    val dict = Patterns ++ extraPatterns
    val m = Ref.matcher(pattern)
    val sb = new java.lang.StringBuilder
    val fields = Seq.newBuilder[Field]
    var last = 0
    while (m.find()) {
      sb.append(pattern, last, m.start())
      val name = m.group(1)
      val field = Option(m.group(2))
      val typ = Option(m.group(3)).getOrElse("string")
      val base = dict.getOrElse(name,
        throw new IllegalArgumentException(s"unknown grok pattern %{$name}"))
      // recurse: a dictionary entry may itself hold %{...} references
      val inner = compile(base, extraPatterns, depth + 1)
      field match {
        case Some(f) =>
          // the outer group OPENS before any inner group → outer field first
          fields += Field(f, typ)
          fields ++= inner.fields
          sb.append('(').append(inner.regex).append(')')
        case None =>
          fields ++= inner.fields
          sb.append("(?:").append(inner.regex).append(")")
      }
      last = m.end()
    }
    sb.append(pattern, last, pattern.length)
    val out = Compiled(sb.toString, fields.result())
    // Enforce the 'no raw capturing groups' contract at the TOP level (the
    // dictionary is group-free by construction): a user '(' would silently
    // shift every field to the wrong group index.
    if (depth == 0) {
      val actual = java.util.regex.Pattern.compile(out.regex).matcher("").groupCount()
      require(actual == out.fields.length,
        s"grok pattern has ${actual - out.fields.length} raw capturing group(s) — " +
          s"use (?:...) for grouping: $pattern")
    }
    out
  }

  /** Column API: one-pass typed-struct extraction; null on no match. */
  def extract(text: Column, pattern: String,
              extraPatterns: Map[String, String] = Map.empty): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      GrokExtractExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(text),
        pattern, extraPatterns.toSeq.sortBy(_._1)))
}

/** One-pass grok extraction: text → struct of typed fields; null when the
  * pattern does not match (unanchored find, grok convention). */
case class GrokExtractExpr(child: Expression, pattern: String,
                           extraPatterns: Seq[(String, String)] = Nil)
    extends UnaryExpression {

  @transient private lazy val compiled = Grok.compile(pattern, extraPatterns.toMap)
  @transient private lazy val re = java.util.regex.Pattern.compile(compiled.regex)

  override def dataType: DataType = compiled.schema
  override def nullable: Boolean = true

  def compute(input: Any): Any = {
    val m = re.matcher(input.asInstanceOf[UTF8String].toString)
    if (!m.find()) return null
    val vals = new Array[Any](compiled.fields.length)
    var i = 0
    while (i < vals.length) {
      val g = m.group(i + 1)
      vals(i) =
        if (g == null) null
        else try {
          compiled.fields(i).typ match {
            case "int" => Integer.valueOf(g.toInt)
            case "long" => java.lang.Long.valueOf(g.toLong)
            case "double" | "float" => java.lang.Double.valueOf(g.toDouble)
            case "boolean" => java.lang.Boolean.valueOf(g.toBoolean)
            case _ => UTF8String.fromString(g)
          }
          // IllegalArgumentException covers NumberFormatException AND
          // "maybe".toBoolean — any failed cast nulls the FIELD, never the row
        } catch { case _: IllegalArgumentException => null }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
  }

  override def nullSafeEval(input: Any): Any = compute(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => NativeCodegen.callCompute(ctx, ev, this, dataType, c))
  override protected def withNewChildInternal(c: Expression): GrokExtractExpr =
    copy(child = c)
}
