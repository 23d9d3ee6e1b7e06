package pipeline.io

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/**
 * Per-partition lineage/checkpoint ledger (BASELINE.json north_rule:
 * "resumable from checkpoint with per-partition lineage + metrics").
 *
 * One JSON line per committed work unit, appended by the driver *after*
 * the unit's files land — the Spark-native form of the reference's
 * flush→ack cycle (kawa at-least-once; `examples/reveald.service:10`
 * Restart=always + redelivery). A rerun skips committed units and
 * re-stages incomplete ones, so writes are exactly-once-visible even
 * though tasks are at-least-once.
 *
 * Driver-side and append-only by design: commit coordination is the
 * driver's job in Spark (same role as FileFormatWriter's commit
 * protocol); executors never touch the ledger.
 */
final class Ledger(dir: String) {

  private val file: Path = Paths.get(dir, "ledger.jsonl")
  Files.createDirectories(file.getParent)

  // escape-aware: the captured value may contain \" and \\ sequences
  // written by commit()'s escaper; unescape() inverts them so a unit name
  // containing a quote round-trips and still matches on resume
  private val UnitRe = """"unit"\s*:\s*"((?:[^"\\]|\\.)*)"""".r

  private def unescape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case e => sb.append(e); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Work units already committed (survives restarts). */
  def committedUnits(): Set[String] =
    if (!Files.exists(file)) Set.empty
    else Files.readAllLines(file, UTF_8).asScala
      .flatMap(l => UnitRe.findFirstMatchIn(l).map(m => unescape(m.group(1)))).toSet

  /** Total rows recorded per unit — the delivery accounting trail. */
  def committedRows(): Map[String, Long] = {
    if (!Files.exists(file)) return Map.empty
    val RowsRe = """"rows"\s*:\s*(\d+)""".r
    Files.readAllLines(file, UTF_8).asScala.flatMap { l =>
      for {
        u <- UnitRe.findFirstMatchIn(l).map(m => unescape(m.group(1)))
        r <- RowsRe.findFirstMatchIn(l).map(_.group(1).toLong)
      } yield u -> r
    }.toMap
  }

  /** Append a commit record. Atomic enough for a single driver (POSIX
    * O_APPEND of one small line); Iceberg snapshot commit on a cluster. */
  def commit(unit: String, rows: Long, metrics: Map[String, Long] = Map.empty): Unit = {
    // General checkpoint API: escaping via the shared Jsonl helper (a
    // quote/backslash/control char in a unit name must not corrupt the
    // ledger line or mis-parse under UnitRe on resume).
    import Jsonl.esc
    val extra = metrics.map { case (k, v) => s""","${esc(k)}":$v""" }.mkString
    Jsonl.appendLine(file,
      s"""{"unit":"${esc(unit)}","rows":$rows,"ts":"${java.time.Instant.now()}"$extra}""")
  }
}
