package pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import pipeline.config.{PipelineConfig, RuleCompiler}
import pipeline.fixtures.Webtext
import pipeline.stages.{Parse, Route}

/** Config surface semantics (SURVEY.md §1.3, T6): hujson tolerance,
  * $ENV expansion, both declaration shapes, config-driven routing. */
class ConfigSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(4, 4, "config-spec")

  // mirrors the shape of reference examples/config.json (comments, trailing
  // commas, env-var webhook) + a routing block for our fan-out semantics
  val hujson: String =
    """{
      |  // this is an example config file (comments are legal)
      |  "sources": {
      |    "nginx_syslog": { "type": "syslog", "path": "/landing/nginx", },
      |    "journald": { "type": "journald", "maxLineLenKB": 200 },
      |  },
      |  "destinations": {
      |    "s3": { "type": "s3", "pathPrefix": "logs/", "batchSize": 100, },
      |    "runreveal": { "type": "webhook", "webhookURL": "$WEBHOOK_URL",
      |                   "batchSize": 100, "flushFreq": "10s" },
      |    "printer": { "type": "printer" },
      |  },
      |  "routing": [
      |    { "when": "status >= 500", "sinks": ["printer", "runreveal"] },
      |    { "when": "lang == 'en'", "sinks": ["runreveal"] },
      |    { "when": "", "sinks": ["s3"] },
      |  ],
      |}""".stripMargin

  test("hujson parse: comments, trailing commas, env expansion, both shapes") {
    val env = Map("WEBHOOK_URL" -> "https://example.test/hook")
    val spec = PipelineConfig.parse(hujson, env)
    assert(spec.sources.map(_.id) == Seq("nginx_syslog", "journald"))
    assert(spec.sources(1).maxLineLenKB.contains(200))
    assert(spec.sinks.find(_.id == "runreveal").get.webhookUrl
      .contains("https://example.test/hook"))
    assert(spec.sinks.find(_.id == "runreveal").get.flushFreq.contains("10s"))
    // unexpanded when env var missing: value preserved verbatim
    val spec2 = PipelineConfig.parse(hujson, Map.empty)
    assert(spec2.sinks.find(_.id == "runreveal").get.webhookUrl.contains("$WEBHOOK_URL"))
    // array-shaped declarations (mqtt_config.json style)
    val arr = PipelineConfig.parse(
      """{"sources": [ {"type": "mqtt", "topic": "t"} ],
        |"destinations": [ {"type": "mqtt"}, {"type": "printer"} ]}""".stripMargin)
    assert(arr.sources.head.kind == "mqtt" && arr.sinks.size == 2)
  }

  test("config-driven routing equals the built-in default rules") {
    val s = spark
    s.sparkContext.setLogLevel("ERROR")
    val spec = PipelineConfig.parse(hujson, Map("WEBHOOK_URL" -> "x"))
    val rules = RuleCompiler.rules(spec)
    val parsed = Parse(Webtext.df(s, 3000, 4))
    val viaConfig = Route(parsed, rules).groupBy("sink").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaDefault = Route(parsed).groupBy("sink").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaConfig == viaDefault)
  }

  test("render/parse round-trip: every reference example config survives") {
    val refs = Seq("config.json", "mqtt_config.json", "windows/config_windows.json",
      "journald_to_s3batch_config.json", "stdin_to_s3_config.json")
    // declaration order of sources/sinks is semantically irrelevant (maps
    // in the config), so compare as sets; routing order is significant
    def canon(s: pipeline.config.PipelineSpec) =
      (s.sources.toSet, s.sinks.toSet, s.rules)
    refs.foreach { f =>
      val spec = PipelineConfig.load(s"/root/reference/examples/$f")
      val back = PipelineConfig.parse(PipelineConfig.render(spec))
      assert(canon(back) == canon(spec), s"round-trip drift for $f")
    }
    // and with a routing block (our extension)
    val spec = PipelineConfig.parse(hujson, Map("WEBHOOK_URL" -> "x"))
    assert(canon(PipelineConfig.parse(PipelineConfig.render(spec))) == canon(spec))
  }

  test("transforms block: parse, env expansion, order, round-trip, errors") {
    val cfg =
      """{
        |  "sources": {"in": {"type": "file"}},
        |  "destinations": {"s3": {"type": "s3"}},
        |  "transforms": [
        |    {"type": "pii_redact"},
        |    {"type": "lang_allowlist", "langs": "$LANGS"},
        |    {"type": "stratified_sample", "rates": "en:50,de:30", "default": "10"},
        |  ],
        |}""".stripMargin
    val spec = PipelineConfig.parse(cfg, Map("LANGS" -> "en,de"))
    assert(spec.transforms.map(_.kind) ==
      Seq("pii_redact", "lang_allowlist", "stratified_sample"))
    assert(spec.transforms(1).options("langs") == "en,de")
    val back = PipelineConfig.parse(PipelineConfig.render(spec))
    assert(back.transforms == spec.transforms) // order significant
    // compile-time (not executor-time) failures for bad configs
    val e1 = intercept[IllegalArgumentException] {
      pipeline.config.TransformCompiler.one(
        pipeline.config.TransformSpec("no_such_kind"))
    }
    assert(e1.getMessage.contains("unknown transform kind"))
    val e2 = intercept[IllegalArgumentException] {
      pipeline.config.TransformCompiler.one(
        pipeline.config.TransformSpec("repetition_filter",
          Map("maxTopBigramFraction" -> "not-a-number")))
    }
    assert(e2.getMessage.contains("maxTopBigramFraction"))
    intercept[IllegalArgumentException] {
      pipeline.config.TransformCompiler.one(
        pipeline.config.TransformSpec("lang_allowlist"))
    }
    // array-valued options fail config-shaped (Jackson asText() would
    // silently render them as "")
    val e3 = intercept[IllegalArgumentException] {
      PipelineConfig.parse(
        """{"sources": {"in": {"type": "file"}},
          | "destinations": {"s3": {"type": "s3"}},
          | "transforms": [{"type": "lang_allowlist", "langs": ["en","de"]}]}""".stripMargin)
    }
    assert(e3.getMessage.contains("must be a scalar"))
  }

  test("streamDedupNear block: durations, defaults, round-trip, validation") {
    def parse(block: String) = PipelineConfig.parse(
      s"""{"sources": {"in": {"type": "file"}},
         | "destinations": {"s3": {"type": "s3"}},
         | "streamDedupNear": $block}""".stripMargin)
    // duration spellings
    assert(parse("""{"delay": "30m"}""").streamDedupNear.get.delayMs == 1800000L)
    assert(parse("""{"delay": "10s"}""").streamDedupNear.get.delayMs == 10000L)
    assert(parse("""{"delay": "500ms"}""").streamDedupNear.get.delayMs == 500L)
    assert(parse("""{"delay": "2d"}""").streamDedupNear.get.delayMs == 172800000L)
    // defaults match the programmatic API's
    assert(parse("{}").streamDedupNear.contains(
      pipeline.config.StreamNearDedupSpec(3600000L, 3, 4, 4)))
    // absent block → None
    assert(PipelineConfig.parse(
      """{"sources": {"in": {"type": "file"}},
        | "destinations": {"s3": {"type": "s3"}}}""".stripMargin)
      .streamDedupNear.isEmpty)
    // render/parse round-trip (canonical ms form)
    val spec = parse("""{"delay": "24h", "bands": 2, "rowsPerBand": 8}""")
    assert(PipelineConfig.parse(PipelineConfig.render(spec)).streamDedupNear ==
      spec.streamDedupNear)
    // config-shaped failures at LOAD, never at stream start
    val e1 = intercept[IllegalArgumentException](parse("""{"delay": "soon"}"""))
    assert(e1.getMessage.contains("streamDedupNear.delay") &&
      e1.getMessage.contains("soon"))
    val e2 = intercept[IllegalArgumentException](parse("""{"bands": 0}"""))
    assert(e2.getMessage.contains("bands"))
    // a typo'd key must not silently fall back to a default
    val e3 = intercept[IllegalArgumentException](parse("""{"rowPerBand": 4}"""))
    assert(e3.getMessage.contains("rowPerBand"))
    val e4 = intercept[IllegalArgumentException](parse("""[1, 2]"""))
    assert(e4.getMessage.contains("must be an object"))
  }

  test("rule compiler: operators and conjunction") {
    val s = spark
    import s.implicits._
    val df = Seq((200, "en", 10L), (504, "de", 99L), (301, "en", 5L))
      .toDF("status", "lang", "bytes")
    def n(w: String) = df.filter(RuleCompiler.compile(w)).count()
    assert(n("status >= 500") == 1)
    assert(n("lang == 'en'") == 2)
    assert(n("lang != 'en'") == 1)
    assert(n("status < 400 && bytes <= 10") == 2)
    assert(n("") == 3)
    intercept[IllegalArgumentException](RuleCompiler.compile("status ~ 5"))
  }
}
