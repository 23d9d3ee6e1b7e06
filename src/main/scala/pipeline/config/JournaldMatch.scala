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
 * }}}
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
    val groups = query.trim.split("(^|\\s)\\+(\\s|$)").toSeq
      .map(_.trim).filter(_.nonEmpty)
    require(groups.nonEmpty, s"empty journald match [$query]")
    groups.map(compileGroup).reduce(_ || _)
  }

  private def compileGroup(g: String): Column = {
    val terms = g.split("\\s+").toSeq.filter(_.nonEmpty).map { t =>
      val i = t.indexOf('=')
      require(i > 0,
        s"bad journald match term '$t' (want FIELD=VALUE, journalctl(1) MATCHES)")
      val field = t.substring(0, i)
      require(field.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"bad journald field name '$field'")
      (field, t.substring(i + 1))
    }
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
