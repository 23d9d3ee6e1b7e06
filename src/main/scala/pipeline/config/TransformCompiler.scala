package pipeline.config

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import pipeline.ops.CorpusRefine

/**
 * Compiles config `transforms` entries ([[TransformSpec]]) to DataFrame
 * stages, exposing the pipeline.ops corpus operators on the config surface
 * (our extension — the reference daemon has no processor pipeline, but a
 * corpus-assembly user needs cleaning between source and destination).
 *
 * Stages run IN CONFIG ORDER on the fanned-in doc frame (url, warc_ts,
 * html, text, lang, source, …), before parse/route. Kinds:
 *
 *  - `pii_redact`            — redact emails/phones/IPv4 in `column`
 *                              (default text)
 *  - `dedup_exact`           — drop later copies of identical text
 *                              (keyed by url; null text passes through)
 *  - `lang_allowlist`        — keep rows whose lang is in `langs` ("en,de")
 *  - `repetition_filter`     — drop docs whose top-bigram fraction exceeds
 *                              `maxTopBigramFraction`; docs with < 2 words
 *                              carry no repetition signal and are KEPT
 *  - `stratified_sample`     — deterministic hash sample; `rates`
 *                              = "en:50,de:30", `default` = percent
 *  - `truncate`              — cap `column` (default text) at `maxChars`
 *
 * Unknown kinds and malformed options fail at compile time with a
 * config-shaped error (never mid-job on an executor).
 */
object TransformCompiler {

  def apply(spec: PipelineSpec): DataFrame => DataFrame =
    spec.transforms.map(one).foldLeft(identity[DataFrame] _)(_ andThen _)

  def one(t: TransformSpec): DataFrame => DataFrame = {
    def opt(key: String): Option[String] = t.options.get(key)
    def intOpt(key: String): Option[Int] = opt(key).map { s =>
      s.toIntOption.getOrElse(err(s"option '$key' must be an integer, got '$s'"))
    }
    def err(msg: String): Nothing = throw new IllegalArgumentException(
      s"transform '${t.kind}': $msg")

    t.kind match {
      case "pii_redact" =>
        val c = opt("column").getOrElse("text")
        df => df.withColumn(c, CorpusRefine.redactPii(col(c)))

      case "dedup_exact" =>
        // digest-keyed, NOT url-keyed: fan-in rows have no unique id (the
        // same url arrives from several sources — exactly the overlap this
        // transform exists to collapse), so keep ONE arbitrary row per
        // text digest; null-text rows pass through uncollapsed (they
        // belong to the deadletter path, and a shared null digest must not
        // conflate distinct corrupt rows)
        df => {
          val withD = df.withColumn("_digest", md5(col("text").cast("binary")))
          withD.filter(col("_digest").isNotNull).dropDuplicates("_digest")
            .unionByName(withD.filter(col("_digest").isNull))
            .drop("_digest")
        }

      case "lang_allowlist" =>
        val langs = opt("langs").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(err("needs 'langs' (comma-separated)"))
        if (langs.isEmpty) err("empty 'langs'")
        df => df.filter(col("lang").isin(langs: _*))

      case "repetition_filter" =>
        val maxFrac = opt("maxTopBigramFraction")
          .map(s => s.toDoubleOption.getOrElse(
            err(s"bad maxTopBigramFraction '$s'")))
          .getOrElse(err("needs 'maxTopBigramFraction'"))
        df => {
          val st = pipeline.expr.PortableExprs.repetitionStats(col("text"))
          // null stats = < 2 words = no repetition signal → keep
          df.withColumn("_rep", st)
            .filter(col("_rep").isNull ||
              col("_rep.top_bigram_n").cast("double") /
                col("_rep.n_bigrams").cast("double") <= maxFrac)
            .drop("_rep")
        }

      case "stratified_sample" =>
        val rates = opt("rates").map(_.split(",").toSeq.map { kv =>
          kv.split(":") match {
            case Array(k, v) => k.trim -> v.trim.toIntOption.getOrElse(
              err(s"bad rate '$kv'"))
            case _ => err(s"bad rate '$kv' (want lang:percent)")
          }
        }.toMap).getOrElse(Map.empty[String, Int])
        val default = intOpt("default").getOrElse(
          if (rates.isEmpty) err("needs 'rates' and/or 'default'") else 100)
        val strata = opt("strata").getOrElse("lang")
        // keyed by url COALESCED to '' — sampling is consistent per
        // document key (all copies of a url share one verdict, which keeps
        // sampling stable under redelivery), and a null url hashes like
        // any other key instead of being unconditionally dropped
        df => CorpusRefine.stratifiedSample(
          df.withColumn("_sk", coalesce(col("url"), lit(""))),
          "_sk", strata, rates, default).drop("_sk")

      case "truncate" =>
        val maxChars = intOpt("maxChars").getOrElse(err("needs 'maxChars'"))
        if (maxChars <= 0) err(s"maxChars must be positive, got $maxChars")
        val c = opt("column").getOrElse("text")
        df => df.withColumn(c, substring(col(c), 1, maxChars))

      case other =>
        err(s"unknown transform kind '$other' (known: pii_redact, " +
          "dedup_exact, lang_allowlist, repetition_filter, " +
          "stratified_sample, truncate)")
    }
  }
}
