package pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.scalatest.funsuite.AnyFunSuite

import pipeline.expr.ParseEventExpr

/** The fast path (parseBytes → streamNorm, token-stream Jackson) and the slow
  * path (parse → readTree/buildNorm, used above the maxLineLenKB cutoff) must
  * normalize every record IDENTICALLY — otherwise the same event changes
  * meaning at the 200KB boundary. These fixtures are adversarial JSON shapes:
  * nested sibling objects inside sections, duplicate keys with null
  * (last-occurrence-wins), section keys re-bound to scalars/arrays/objects,
  * `ts` bound to non-scalars, numeric coercion edge cases.
  */
class ParsePathParitySpec extends AnyFunSuite {

  private val goodTs = "\"ts\":\"2024-01-02T03:04:05Z\""

  private val jsonCases: Seq[String] = Seq(
    // nested sibling object BEFORE section fields (r1 ADVICE: section context
    // was lost after a depth-3 object, dropping status=500 here)
    s"""{$goodTs,"response":{"hdr":{"a":1},"status":500,"body_bytes_sent":"12"}}""",
    // duplicate ts, later null → corrupt under readTree last-wins
    """{"ts":"2024-01-02T03:04:05Z","ts":null}""",
    """{"ts":null,"ts":"2024-01-02T03:04:05Z"}""",
    // duplicate section object replaces wholesale (method must be null)
    s"""{$goodTs,"request":{"method":"GET","uri":"/a"},"request":{"uri":"/b"}}""",
    // section re-bound to scalar → fields absent
    s"""{$goodTs,"upstream":{"bytes_sent":5},"upstream":"gone"}""",
    // duplicate field, later null
    s"""{$goodTs,"response":{"status":200,"status":null}}""",
    // deep nesting + arrays-of-objects skipped, fields after them kept
    s"""{$goodTs,"request":{"a":{"b":{"c":1}},"method":"POST","x":[1,{"y":2}],"uri":"/東京"}}""",
    // non-section object ignored
    s"""{$goodTs,"other":{"status":999},"response":{"status":201}}""",
    // null → re-set → nested {} → value after it
    s"""{$goodTs,"upstream":{"response_length":null,"nested":{},"response_length":"77"}}""",
    // ts bound to object/array: readTree asText()=="" → accepted, null micros
    """{"ts":{},"request":{"method":"G"}}""",
    """{"ts":[1,2]}""",
    s"""{$goodTs,"request":[1,2],"upstream":{"bytes_sent":3},"upstream":[]}""",
    // nested object named like a field
    s"""{$goodTs,"response":{"deep":{"status":999},"status":204}}""",
    // malformed
    """{"broken": """,
    // string→long coercion failure inside a guard (corrupt, not crash)
    s"""{$goodTs,"upstream":{"response_length":"12x"}}""",
    // bytes_sent coercion of a non-numeric string → 0 on both paths
    s"""{$goodTs,"upstream":{"bytes_sent":"12x"}}""",
    s"""{$goodTs,"request":"scalar"}""",
    // trailing garbage after the root object (readTree ignores it)
    s"""{$goodTs} trailing garbage""",
    // string status coerces on both paths
    s"""{$goodTs,"response":{"status":"204"}}""",
    // numeric ts → unparseable timestamp but NOT corrupt
    """{"ts":1.50}""",
    // explicit nulls and empty strings through the numeric coalesce
    s"""{$goodTs,"request":{"method":null},"response":{"body_bytes_sent":""}}""",
    // duplicate ts where the LAST parses
    s"""{"ts":"junk",$goodTs}""",
    // TRACKED FIELD bound to a container: readTree coerces asText→"" /
    // asInt,asLong→0 — the fast path must match, not skip
    s"""{$goodTs,"response":{"status":[500]}}""",
    s"""{$goodTs,"request":{"method":"GET","method":[1]}}""",
    s"""{$goodTs,"upstream":{"bytes_sent":{"x":1}}}""",
    s"""{$goodTs,"response":{"status":{"a":1},"body_bytes_sent":[]},"request":{"uri":{}}}""",
    s"""{$goodTs,"upstream":{"response_length":{"deep":{"x":[1]}},"bytes_sent":"7"}}""",
    // everything at once
    s"""{"x":[{"ts":"nope"}],$goodTs,"request":{"hdr":{"uri":"/fake"},"uri":"/real","z":{}},"upstream":{"bytes_sent":"9"},"response":{"status":502,"w":[[1],{}],"body_bytes_sent":"3"}}"""
  )

  private def texts: Seq[String] =
    jsonCases.map(j => s"title: Tïtle 東京\nstatus=200 bytes=7 method=GET\nbody über text\n$j") ++ Seq(
      "no structure at all",
      "",
      "title: only\n",
      s"title: t\nkv\nbody\n not-json-line"
    )

  /** Schema-aware canonical form of the parse result struct. */
  private def canon(r: InternalRow): Seq[Any] = {
    def normOf(n: InternalRow): Seq[Any] =
      if (n == null) null
      else Seq(
        if (n.isNullAt(0)) null else n.getLong(0),
        if (n.isNullAt(1)) null else n.getUTF8String(1).toString,
        if (n.isNullAt(2)) null else n.getUTF8String(2).toString,
        if (n.isNullAt(3)) null else n.getInt(3),
        if (n.isNullAt(4)) null else n.getLong(4),
        if (n.isNullAt(5)) null else n.getLong(5),
        if (n.isNullAt(6)) null else n.getLong(6))
    Seq(
      if (r.isNullAt(0)) null else r.getUTF8String(0).toString,
      if (r.isNullAt(1)) null else r.getUTF8String(1).toString,
      r.getInt(2), r.getLong(3),
      if (r.isNullAt(4)) null else r.getUTF8String(4).toString,
      if (r.isNullAt(5)) null else r.getUTF8String(5).toString,
      r.getBoolean(6), r.getBoolean(7),
      normOf(if (r.isNullAt(8)) null else r.getStruct(8, 7)))
  }

  test("fast byte path ≡ slow readTree path on adversarial records") {
    val url = "https://parity.example.com/p"
    texts.foreach { tx =>
      val fast = canon(ParseEventExpr.parseBytes(url,
        tx.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val slow = canon(ParseEventExpr.parse(url, tx, 200))
      assert(fast == slow, s"path divergence for text: [$tx]")
    }
  }

  test("fast path norm matches on the regression shapes explicitly") {
    def normOf(tx: String): InternalRow = {
      val r = ParseEventExpr.parseBytes("https://x/",
        tx.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (r.isNullAt(8)) null else r.getStruct(8, 7)
    }
    def framed(j: String) = s"t\nk\nb\n$j"
    // nested sibling must NOT drop the section fields that follow it
    val n1 = normOf(framed(s"""{$goodTs,"response":{"hdr":{},"status":500,"body_bytes_sent":"12"}}"""))
    assert(n1 != null && n1.getInt(3) == 500 && n1.getLong(4) == 12L)
    // later ts:null → corrupt (null norm, is_corrupt true)
    val r2 = ParseEventExpr.parseBytes("https://x/",
      framed("""{"ts":"2024-01-02T03:04:05Z","ts":null}""").getBytes("UTF-8"))
    assert(r2.isNullAt(8) && r2.getBoolean(6))
  }
}
