package pipeline.io

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardOpenOption}

/** Shared driver-side jsonl primitives for the append-only accounting
  * surfaces (Ledger, streaming.StreamMetrics): ONE escape implementation
  * so the two files can never disagree on encoding. */
object Jsonl {

  /** JSON string-escape for interpolated values: a quote/backslash/control
    * char in a value must not corrupt the line or mis-parse on re-read. */
  def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** O_APPEND one line — atomic enough for a single driver (POSIX append
    * of one small line); Iceberg snapshot commit on a cluster. */
  def appendLine(file: Path, line: String): Unit =
    Files.write(file, (line + "\n").getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
}
