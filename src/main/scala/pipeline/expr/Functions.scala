package pipeline.expr

import org.apache.spark.sql.SparkSession

/**
 * SQL registration of the native expressions, so `spark.sql` users get the
 * same operator surface as the Column API (a reference user switching to
 * this library can stay in SQL):
 *
 *   SELECT graft_simhash(text), graft_fingerprint(text),
 *          graft_minhash_sig(text, 3, 8), graft_shingles(text, 3),
 *          graft_cosine(a, b), graft_hyperplane_sig(vec, 6, 64),
 *          graft_parse_event(url, text).*
 */
object Functions {

  private def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                     what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_simhash",
      es => SimHashExpr(es.head, if (es.size > 1) intLit(es(1), "bits") else 16),
      "built-in")
    reg.createOrReplaceTempFunction("graft_fingerprint",
      es => FingerprintExpr(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_sig",
      es => MinHashSigExpr(es.head, intLit(es(1), "nGram"), intLit(es(2), "numHashes")),
      "built-in")
    reg.createOrReplaceTempFunction("graft_shingles",
      es => ShinglesExpr(es.head, intLit(es(1), "nGram")), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine",
      es => CosineSimExpr(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_hyperplane_sig",
      es => HyperplaneSigExpr(es.head, intLit(es(1), "planes"), intLit(es(2), "dim")),
      "built-in")
    reg.createOrReplaceTempFunction("graft_parse_event",
      es => ParseEventExpr(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_grok",
      es => GrokExtractExpr(es.head, strLit(es(1), "pattern")), "built-in")
    reg.createOrReplaceTempFunction("graft_repetition",
      es => RepetitionStatsExpr(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_image_dims",
      es => ImageDimsExpr(es.head), "built-in")
    // explicit input casts: these natives read UTF8String/byte[] directly
    // (no ExpectsInputTypes — AbstractDataType is private[sql] in Spark 4),
    // so SQL callers get the same coercion the Column seams apply
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{BinaryType, StringType}
    reg.createOrReplaceTempFunction("graft_audio_header",
      es => WavHeaderExpr(Cast(es.head, BinaryType)), "built-in")
    reg.createOrReplaceTempFunction("graft_video_header",
      es => Mp4HeaderExpr(Cast(es.head, BinaryType)), "built-in")
    // optional 2nd arg: a GPT-2-format merges.txt path, resolved on the
    // driver at analysis time (the parsed table ships in the plan); pass
    // '' to keep the embedded fixture. Optional 3rd arg: pretokenizer
    // mode 'char' (default) | 'byte' (GPT-2 byte-level — the mode for a
    // verbatim upstream vocabulary; see pipeline.expr.Bpe). Optional 4th
    // arg (encode/decode): a GPT-2 vocab.json path so ids match the
    // upstream assignment; '' keeps rank-derived ids.
    def bpeTable(es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): BpeTable = {
      val byteLevel = es.size > 2 && (strLit(es(2), "pretokenizer") match {
        case "byte" => true
        case "char" => false
        case other => throw new IllegalArgumentException(
          s"pretokenizer must be 'byte' or 'char', got '$other'")
      })
      val path = if (es.size > 1) strLit(es(1), "mergesPath") else ""
      val vocabPath = if (es.size > 3) strLit(es(3), "vocabPath") else ""
      if (path.nonEmpty) Bpe.loadCached(path, byteLevel, vocabPath)
      else if (vocabPath.nonEmpty) throw new IllegalArgumentException(
        "vocabPath requires a mergesPath (the fixture tables use derived ids)")
      else if (byteLevel) Bpe.FixtureByteLevel
      else Bpe.Fixture
    }
    reg.createOrReplaceTempFunction("graft_bpe_count",
      es => BpeCountExpr(Cast(es.head, StringType), bpeTable(es)), "built-in")
    reg.createOrReplaceTempFunction("graft_bpe_encode",
      es => BpeEncodeExpr(Cast(es.head, StringType), bpeTable(es)), "built-in")
    reg.createOrReplaceTempFunction("graft_bpe_decode",
      es => BpeDecodeExpr(
        Cast(es.head, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType)), bpeTable(es)), "built-in")
    reg.createOrReplaceTempFunction("graft_lang_id",
      es => LangIdExpr(Cast(es.head, StringType)), "built-in")
  }

  private def strLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                     what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got: $other")
  }
}
