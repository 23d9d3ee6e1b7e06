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
 * surface, a double quote immediately after the token's FIRST `=` (the
 * field=value boundary) opens a quoted value that carries spaces and `+`
 * (`F="a b"`); inside it `""` is a literal quote. A quote anywhere else —
 * including after a LATER `=` inside the value — is an ordinary character
 * (`F=va"lue` and `F=--opt="x` stay byte-literal), so journald's
 * arbitrary-byte field values stay expressible; a spaced value containing
 * quotes is written start-quoted with inner quotes doubled.
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

  /** One FIELD=VALUE term (the tokenizer already resolved quoting). */
  private def term(t: String): (String, String) = {
    val i = t.indexOf('=')
    require(i > 0,
      s"bad journald match term '$t' (want FIELD=VALUE, journalctl(1) MATCHES)")
    val field = t.substring(0, i)
    require(field.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"bad journald field name '$field'")
    (field, t.substring(i + 1))
  }

  /** Whitespace tokenizer. A `"` RIGHT AFTER `=` opens a quoted value
    * (whitespace and `+` become ordinary characters; `""` inside is a
    * literal quote); a `"` anywhere else is an ordinary character, so
    * values that merely CONTAIN quotes keep their literal meaning. */
  private def tokenize(g: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var inQuote = false
    var i = 0
    while (i < g.length) {
      val c = g.charAt(i)
      if (inQuote) {
        if (c == '"') {
          if (i + 1 < g.length && g.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
          else inQuote = false
        } else cur.append(c)
      } else if (c == '"' && cur.length > 0 &&
        cur.charAt(cur.length - 1) == '=' &&
        cur.indexOf("=") == cur.length - 1) {
        // VALUE START only: the '=' just consumed is the token's FIRST '='
        // (field=value boundary) — an '=' inside the value keeps a
        // following quote literal (MESSAGE=--opt="a b" stays byte-literal)
        inQuote = true
      } else if (c.isWhitespace) {
        if (cur.length > 0) { out += cur.toString; cur.setLength(0) }
      } else cur.append(c)
      i += 1
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
