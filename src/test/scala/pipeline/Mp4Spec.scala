package pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import pipeline.expr.{Mp4EncodeExpr, Mp4Exprs, Mp4HeaderExpr}

/** ISO-BMFF (MP4) container-header box walk: encode/decode round-trip,
  * version-1 boxes, size edge cases (largesize, size-0, escapes), and the
  * corrupt→null contract that feeds the deadletter path. */
class Mp4Spec extends AnyFunSuite {

  lazy val spark = Sessions.local(4, 4, "mp4-spec")
  private def sc = { spark.sparkContext.setLogLevel("ERROR"); spark }

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(t: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ t.getBytes("US-ASCII") ++ payload

  test("encode → header round-trip is exact; magic is a real ftyp") {
    val bytes = Mp4EncodeExpr.encode(1000, 90000L, 1280, 720)
    assert(Mp4HeaderExpr.header(bytes).contains(("isom", 1000, 90000L, 1280, 720)))
    // 'ftyp' fourcc at offset 4, major brand 'isom' at offset 8
    assert(new String(bytes.slice(4, 8), "US-ASCII") == "ftyp")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "isom")
    // deterministic: same args → same bytes
    assert(bytes.sameElements(Mp4EncodeExpr.encode(1000, 90000L, 1280, 720)))
    // bad args rejected at encode time
    intercept[IllegalArgumentException] { Mp4EncodeExpr.encode(0, 1L, 1, 1) }
    intercept[IllegalArgumentException] { Mp4EncodeExpr.encode(1000, -1L, 1, 1) }
    intercept[IllegalArgumentException] { Mp4EncodeExpr.encode(1000, 1L, 0, 1) }
  }

  test("corrupt/truncated/non-mp4 payloads → None, never a throw") {
    val good = Mp4EncodeExpr.encode(600, 6000L, 320, 240)
    assert(Mp4HeaderExpr.header(null).isEmpty)
    assert(Mp4HeaderExpr.header(Array.empty[Byte]).isEmpty)
    assert(Mp4HeaderExpr.header(Array.tabulate(64)(_.toByte)).isEmpty)
    // every truncation of a valid file must refuse or parse, never throw
    // (truncating only mdat may legitimately still parse — moov is intact)
    (0 until good.length by 7).foreach { n =>
      Mp4HeaderExpr.header(good.take(n)) // must not throw
    }
    // a declared box size escaping the buffer refuses
    val escaping = good.clone()
    escaping(0) = 0x7f.toByte // ftyp size becomes enormous
    assert(Mp4HeaderExpr.header(escaping).isEmpty)
    // a zero-size inner loop can't spin: size-0 top-level box runs to EOF
    val zeroTail = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++
      be32(0L) ++ "free".getBytes("US-ASCII")
    assert(Mp4HeaderExpr.header(zeroTail).isEmpty) // no moov → None
    // wav/png bytes (other real codecs' magic) refuse here
    assert(Mp4HeaderExpr.header(
      pipeline.expr.WavEncodeExpr.encode(8000, 1, 100)).isEmpty)
  }

  test("version-1 mvhd/tkhd (64-bit times) and largesize boxes parse") {
    // hand-built v1 mvhd: ver=1, creation/modification 8 bytes each,
    // timescale u32, duration u64
    val mvhdV1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
        be32(48000L) ++ be32(0L) ++ be32(1234567L) ++
        be32(0x10000L) ++ new Array[Byte](2 + 10 + 36 + 24) ++ be32(2L))
    // v1 tkhd: ver=1, creation/modification u64s, track u32, res u32,
    // duration u64, then the v0 tail (dims at payload end)
    val tkhdV1 = box("tkhd",
      Array[Byte](1, 0, 0, 7) ++ new Array[Byte](16) ++ be32(1L) ++ be32(0L) ++
        be32(0L) ++ be32(1234567L) ++ new Array[Byte](8 + 2 + 2 + 2 + 2 + 36) ++
        be32(1920L << 16) ++ be32(1080L << 16))
    val moov = box("moov", mvhdV1 ++ box("trak", tkhdV1))
    val ftyp = box("ftyp", "mp42".getBytes("US-ASCII") ++ be32(0L))
    assert(Mp4HeaderExpr.header(ftyp ++ moov)
      .contains(("mp42", 48000, 1234567L, 1920, 1080)))
    // the same moov wrapped in a largesize (size=1 + 64-bit) box
    val inner = mvhdV1 ++ box("trak", tkhdV1)
    val largeMoov = be32(1L) ++ "moov".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0) ++ be32(16L + inner.length) ++ inner
    assert(Mp4HeaderExpr.header(ftyp ++ largeMoov)
      .contains(("mp42", 48000, 1234567L, 1920, 1080)))
    // audio-only mp4 (no trak): parses with 0x0 dims
    assert(Mp4HeaderExpr.header(ftyp ++ box("moov", mvhdV1))
      .contains(("mp42", 48000, 1234567L, 0, 0)))
  }

  test("Spark expression + SQL surface; corrupt rows null out") {
    val s = sc
    import s.implicits._
    val d = Seq(
      (1L, Mp4EncodeExpr.encode(1000, 60000L, 640, 360)),
      (2L, Array.tabulate(32)(_.toByte)),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "mp4")
    val out = d.select(col("id"), Mp4Exprs.mp4Header(col("mp4")).as("h"))
      .selectExpr("id", "h.brand", "h.duration", "h.width").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else (r.getString(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) == (("isom", 60000L, 640)))
    assert(out(2L) == null && out(3L) == null)
    pipeline.expr.Functions.registerAll(s)
    d.createOrReplaceTempView("mp4_t")
    val viaSql = s.sql(
      "SELECT id, graft_video_header(mp4).duration AS d FROM mp4_t WHERE id = 1")
      .collect().head.getLong(1)
    assert(viaSql == 60000L)
  }
}
