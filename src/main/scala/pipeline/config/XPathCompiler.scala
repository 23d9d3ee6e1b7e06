package pipeline.config

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}

/**
 * Compiles the eventlog source-filter query strings shipped in the
 * reference's Windows configs to Catalyst Column predicates.
 *
 * The reference accepts XPath 1.0 over the Windows event XML and documents
 * this subset (`examples/windows/config_windows.json:6-27` uses `"*"`;
 * `examples/windows/README.md:165-170` shows
 * `*[EventData[Data[@Name='LogonType']='2'] and System[(EventID=4624)]]`).
 * The compiled grammar covers exactly the documented shapes:
 *
 * {{{
 * query   := '*' ('[' orExpr ']')?
 * orExpr  := andExpr ('or' andExpr)*
 * andExpr := unit ('and' unit)*
 * unit    := '(' orExpr ')'
 *          | 'EventData' '[' 'Data' '[@Name=' STR ']' cmp lit ']'
 *          | 'System' '[' orExpr-over-fields ']'
 * field   := IDENT cmp lit          (inside System[...])
 * cmp     := = | != | < | <= | > | >=
 * lit     := 'string' | integer
 * }}}
 *
 * Mapping onto the relational event shape (pipeline.fixtures.EventLog):
 * `System[Field op v]` → `col("system.Field") op v` (struct field — pushes
 * to the parquet scan via nested predicate pushdown), and
 * `EventData[Data[@Name='K'] op v]` → `element_at(event_data, 'K') op v`
 * (map lookup — evaluated post-scan; map keys are not scan-pushable, which
 * matches the reference evaluating EventData XPath in the subscriber).
 */
object XPathCompiler {

  val SystemCol = "system"
  val EventDataCol = "event_data"

  def compile(query: String): Column = {
    val q = query.trim
    if (q.isEmpty || q == "*") lit(true)
    else new Parser(q).compileQuery()
  }

  /** `query = None` or `Some("*")` ≙ unfiltered, per the reference configs. */
  def compileOpt(query: Option[String]): Option[Column] =
    query.map(_.trim).filter(q => q.nonEmpty && q != "*").map(compile)

  private final class Parser(s: String) {
    private var pos = 0

    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"bad eventlog query at $pos: $msg in [$s]")

    private def ws(): Unit = while (pos < s.length && s(pos).isWhitespace) pos += 1

    private def peek(lit: String): Boolean = { ws(); s.startsWith(lit, pos) }

    private def eat(lit: String): Unit =
      if (peek(lit)) pos += lit.length else err(s"expected '$lit'")

    private def tryEat(lit: String): Boolean = {
      // keyword tokens must not swallow identifier prefixes ("android" != "and")
      if (!peek(lit)) return false
      val end = pos + lit.length
      val keyword = lit.head.isLetter
      if (keyword && end < s.length && (s(end).isLetterOrDigit || s(end) == '_')) false
      else { pos = end; true }
    }

    private def ident(): String = {
      ws()
      val start = pos
      while (pos < s.length && (s(pos).isLetterOrDigit || s(pos) == '_')) pos += 1
      if (pos == start) err("expected identifier")
      s.substring(start, pos)
    }

    private def cmp(): String = {
      ws()
      Seq("!=", "<=", ">=", "=", "<", ">").find(peek) match {
        case Some(op) => pos += op.length; op
        case None => err("expected comparison operator")
      }
    }

    private def literal(): Column = {
      ws()
      if (pos < s.length && s(pos) == '\'') {
        val end = s.indexOf('\'', pos + 1)
        if (end < 0) err("unterminated string")
        val v = s.substring(pos + 1, end); pos = end + 1
        lit(v)
      } else {
        val start = pos
        if (pos < s.length && s(pos) == '-') pos += 1
        val digitsStart = pos
        while (pos < s.length && s(pos).isDigit) pos += 1
        // a lone '-' must err through the parser (positioned message), not
        // leak a raw NumberFormatException from toLong
        if (pos == digitsStart) err("expected literal")
        lit(s.substring(start, pos).toLong)
      }
    }

    private def applyOp(c: Column, op: String, v: Column): Column = op match {
      case "=" => c === v
      case "!=" => c =!= v
      case "<" => c < v
      case "<=" => c <= v
      case ">" => c > v
      case ">=" => c >= v
    }

    def compileQuery(): Column = {
      eat("*")
      ws()
      val result =
        if (tryEat("[")) { val e = orExpr(unit _); eat("]"); e }
        else lit(true)
      ws()
      if (pos != s.length) err("trailing input")
      result
    }

    private def orExpr(atom: () => Column): Column = {
      var acc = andExpr(atom)
      while (tryEat("or")) acc = acc || andExpr(atom)
      acc
    }

    private def andExpr(atom: () => Column): Column = {
      var acc = atom()
      while (tryEat("and")) acc = acc && atom()
      acc
    }

    private def unit(): Column = {
      ws()
      if (tryEat("(")) { val e = orExpr(unit _); eat(")"); e }
      else if (tryEat("EventData")) { eat("["); val e = dataTest(); eat("]"); e }
      else if (tryEat("System")) { eat("["); val e = orExpr(sysUnit _); eat("]"); e }
      else err("expected EventData[...], System[...], or (...)")
    }

    private def dataTest(): Column = {
      eat("Data"); eat("["); eat("@"); eat("Name"); eat("="); ws()
      val key = { // quoted attribute name
        if (pos >= s.length || s(pos) != '\'') err("expected quoted @Name")
        val end = s.indexOf('\'', pos + 1)
        if (end < 0) err("unterminated @Name")
        val k = s.substring(pos + 1, end); pos = end + 1; k
      }
      eat("]")
      // map lookup: getItem is null-safe for maps (missing key → null → test
      // false), matching XPath's no-such-Data = no match
      applyOp(col(EventDataCol)(key), cmp(), literal())
    }

    private def sysUnit(): Column = {
      ws()
      if (tryEat("(")) { val e = orExpr(sysUnit _); eat(")"); e }
      else {
        val f = ident()
        applyOp(col(s"$SystemCol.$f"), cmp(), literal())
      }
    }
  }
}
