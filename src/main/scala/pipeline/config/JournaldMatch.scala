package pipeline.config

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, try_element_at}

/**
 * Compiles journald match expressions to Catalyst Column predicates over
 * the fielded `entries` map a journald source decodes (the journald twin of
 * [[XPathCompiler]]'s eventlog `query`).
 *
 * Grammar = systemd's public `journalctl` match language (journalctl(1)
 * MATCHES): whitespace-separated `FIELD=VALUE` terms; terms for the SAME
 * field OR together, terms for DIFFERENT fields AND together, and a
 * standalone `+` separates whole disjunction groups:
 *
 * {{{
 *   PRIORITY=3 _SYSTEMD_UNIT=nginx.service + PRIORITY=0
 *   ≙ (PRIORITY='3' AND unit='nginx.service') OR PRIORITY='0'
 *   PRIORITY=3 PRIORITY=4   ≙ PRIORITY IN ('3','4')
 *   MESSAGE="Started nginx"  ≙ MESSAGE = 'Started nginx'
 * }}}
 *
 * journalctl matches are separate argv words, so a value with spaces is
 * expressible there via shell quoting; in this single-string config
 * surface, double quotes around the VALUE carry spaces (`F="a b"`).
 *
 * All comparisons are string equality on the raw field value — journald
 * fields are untyped byte strings, so there is no numeric coercion (the
 * reference's journald source carries fields the same way,
 * `examples/journald_to_s3batch_config.json`). A missing field compares
 * null → the term is false, matching journalctl's behavior of not matching
 * entries that lack the field.
 */
object JournaldMatch {

  val EntriesCol = "entries"

  def compile(query: String): Column = {
    // tokenize FIRST (quotes survive), then split groups on standalone '+'
    // tokens — a quoted value containing " + " must not split a group
    val toks = tokenize(query.trim)
    val groups = split(toks, "+").filter(_.nonEmpty)
    require(groups.nonEmpty, s"empty journald match [$query]")
    groups.map(g => compileGroup(g.map(term))).reduce(_ || _)
  }

  private def split[A](xs: Seq[A], sep: A): Seq[Seq[A]] =
    xs.foldLeft(Vector(Vector.empty[A])) { (acc, x) =>
      if (x == sep) acc :+ Vector.empty else acc.init :+ (acc.last :+ x)
    }

  /** One FIELD=VALUE term; a double-quoted VALUE carries whitespace. */
  private def term(t: String): (String, String) = {
    val i = t.indexOf('=')
    require(i > 0,
      s"bad journald match term '$t' (want FIELD=VALUE, journalctl(1) MATCHES)")
    val field = t.substring(0, i)
    require(field.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"bad journald field name '$field'")
    val v = t.substring(i + 1)
    val unquoted =
      if (v.length >= 2 && v.head == '"' && v.last == '"')
        v.substring(1, v.length - 1)
      else v
    (field, unquoted)
  }

  /** Whitespace tokenizer that keeps double-quoted runs intact. */
  private def tokenize(g: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var inQuote = false
    g.foreach {
      case c if c.isWhitespace && !inQuote =>
        if (cur.length > 0) { out += cur.toString; cur.setLength(0) }
      case '"' =>
        inQuote = !inQuote
        cur.append('"')
      case c =>
        cur.append(c)
    }
    require(!inQuote, s"unterminated quote in journald match [$g]")
    if (cur.length > 0) out += cur.toString
    out.result()
  }

  private def compileGroup(terms: Seq[(String, String)]): Column = {
    // same field ORs, distinct fields AND — preserve first-seen field order
    // so the compiled plan is deterministic
    val fieldsInOrder = terms.map(_._1).distinct
    fieldsInOrder.map { f =>
      terms.filter(_._1 == f)
        .map { case (_, v) => try_element_at(col(EntriesCol), lit(f)) === v }
        .reduce(_ || _)
    }.reduce(_ && _)
  }

  /** `query = None` / blank ≙ unfiltered (journalctl with no matches). */
  def compileOpt(query: Option[String]): Option[Column] =
    query.map(_.trim).filter(_.nonEmpty).map(compile)
}
