package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import pipeline.ops.{CorpusRefine, Dedup, Portable, Similarity, TextAnalysis}

/**
 * Driver-contract queries: one per implemented operator (SURVEY.md §2 +
 * the training-data ops), each with an equivalent DuckDB oracle SQL in
 * [[Oracle]]. Column names/aliases MUST match the oracle exactly (the
 * driver sorts columns by name before hashing).
 *
 * Determinism rules (shared with pipeline.ops.Portable): integer/decimal
 * aggregates only (double sums are order-dependent); doubles appear only
 * as bit-deterministic expressions (int/int division, sequential folds,
 * float→double widening); hashes via portable md5 arithmetic.
 */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // ---------- core relational / pipeline operators ----------

  /** Flagship TPC-H-Q1-style aggregate (scan + hash agg). Money is summed
    * as integer cents — `floor(x*100 + 0.5)` is pure IEEE double arithmetic
    * plus an integer sum, bit-identical across engines (DECIMAL outputs
    * round-trip differently through pandas-style readers; DuckDB sum(BIGINT)
    * is HUGEINT and must be cast back down on the oracle side). */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(floor(col("l_extendedprice") * 100 + 0.5)).as("sum_price_cents"),
        count(lit(1)).as("count_order"),
        (sum(col("l_quantity").cast("long")).cast("double") /
          count(lit(1)).cast("double")).as("avg_qty"))

  /** T1: grok/regex field extraction. */
  def qParseExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"),
      col("text").rlike("spark").as("mentions_spark"),
      size(regexp_extract_all(col("text"), lit("join"), lit(0))).cast("long").as("n_join"))

  /** T1: JSON payload parse (events.props). */
  def qParseJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k_val"))

  /** T3-analog on MAP-typed payload fields (the Windows EventData shape:
    * `EventData[Data[@Name='LogonType']]` ≙ element_at(map, key)). */
  def qMapFilter(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    // try_element_at, NOT element_at: ANSI mode (Spark 4 default) throws
    // MAP_KEY_DOES_NOT_EXIST for a missing key, while the oracle's
    // json_extract -> CAST yields NULL and drops the row — a props payload
    // without "k" must filter out, not kill the query
    t(s, dir, "events")
      .withColumn("props_map",
        from_json(col("props"), MapType(StringType, LongType)))
      .filter(try_element_at(col("props_map"), lit("k")) > 50)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_high"),
        sum(try_element_at(col("props_map"), lit("k"))).as("sum_k"))
  }

  /** Exact-dedup APPLIED: the surviving corpus rows (keeper per text). */
  def qDedupApply(s: SparkSession, dir: String): DataFrame =
    Dedup.dropExactDuplicates(t(s, dir, "documents"), "doc_id", "text")
      .select("doc_id", "lang", "n_chars")

  /** Default-value coalescing (nginx empty→0 rule) exercised end-to-end. */
  def qNormalizeCoalesce(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("code",
        when(pmod(col("user_id"), lit(7)) === 0, lit(""))
          .otherwise(col("user_id").cast("string")))
      .select(
        col("event_id"),
        coalesce(nullif(col("code"), lit("")), lit("0")).cast("long").as("norm_user"))

  /** T2: truncation guard + oversize detection. */
  def qTruncateGuard(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      octet_length(substring(col("text"), 1, 100)).cast("long").as("trunc_bytes"),
      (col("n_chars") > 450).as("is_oversize"))

  /** T4: broadcast-join enrichment against a small dim. */
  def qEnrichBroadcast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = Seq(
      ("en", "germanic"), ("de", "germanic"), ("fr", "romance"),
      ("es", "romance"), ("zh", "sinitic")).toDF("lang", "lang_family")
    t(s, dir, "documents")
      .join(broadcast(dim), Seq("lang"), "left")
      .groupBy(coalesce(col("lang_family"), lit("unknown")).as("lang_family"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
  }

  /** Routing rules over documents (mirrors the pipeline's Route stage). */
  private def docSinks = {
    val oversize = col("n_chars") > 450
    when(oversize, array(lit("deadletter"))).otherwise(array_compact(array(
      when(col("source") === "src0", lit("printer")),
      when(col("lang") === "en" || col("source") === "src0", lit("runreveal")),
      lit("s3"))))
  }

  /** D6: routing-tag explode fan-out — row level. */
  def qRouteExplode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), explode(docSinks).as("sink"))

  /** A2: per-sink delivery accounting (must equal routed rows exactly). */
  def qSinkCounts(s: SparkSession, dir: String): DataFrame =
    qRouteExplode(s, dir).groupBy("sink").agg(count(lit(1)).as("n_rows"))

  /** A2: per-SOURCE×sink accounting — the reference's source ids exist to
    * be "referenced when logging or in metrics" (examples/config.json:6-7),
    * so provenance keys the delivery counts too. */
  def qSourceSinkCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), explode(docSinks).as("sink"))
      .groupBy("source", "sink").agg(count(lit(1)).as("n_rows"))

  /** S7: fan-in union of two tagged sources + per-source accounting. */
  def qFaninUnion(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val a = e.filter(col("event_type").isin("click", "view"))
      .withColumn("source", lit("ui"))
    val b = e.filter(col("event_type").isin("purchase", "signup", "error"))
      .withColumn("source", lit("backend"))
    a.unionByName(b).groupBy("source")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** D7: deadletter diversion (oversize events preserved, not dropped). */
  def qDeadletter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").filter(col("n_chars") > 450)
      .select(col("doc_id"), col("n_chars"))

  /** A1-analog: event-time tumbling window aggregation (integer-cents sum;
    * see [[q1Agg]] for why DECIMAL outputs are avoided). */
  def qWindowHourly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + 0.5)).as("sum_value_cents"))

  /** Top-k with deterministic tie-break. */
  def qTopkUsers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("user_id").asc).limit(10)

  /** Event-time SESSIONIZATION (session_window, 30-min gap): the §2.5
    * stateful-window shape, batch form. Spark merges events into a session
    * while the next event starts strictly before prev_ts + gap; the oracle
    * mirrors that with lag() + a cumulative new-session flag (diff >= gap
    * starts a new session — same strict boundary). */
  def qSessionize(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5)).as("sum_value_cents"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sum_value_cents"))

  /** Exact distinct aggregation. */
  def qDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"))

  /** Semi join (resume pattern: rows WITH a match). */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))

  /** Anti join (ledger resume: rows NOT yet committed). */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))

  /** Window ranking: top-3 events by value per type, deterministic ties. */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id").asc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("event_type", "event_id", "value", "rn")
  }

  /** Grouping-sets rollup of the accounting surface. */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").rollup("source", "lang")
      .agg(count(lit(1)).as("n_docs"))

  /** Join + aggregate (shuffle join). Revenue in exact integer e4 units:
    * price-cents × (100 − discount-percent) — pure integer arithmetic on
    * both engines, immune to decimal re-rendering in pandas-style readers. */
  def qJoinAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum(floor(col("l_extendedprice") * 100 + 0.5) *
          (lit(100L) - floor(col("l_discount") * 100 + 0.5))).as("revenue_e4"),
        count(lit(1)).as("n_items"))

  // ---------- training-data ops ----------

  def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents"), "doc_id", "text")

  def qDedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(t(s, dir, "documents"), "doc_id", "text",
      nGram = 3, bands = 2, rowsPerBand = 4)

  def qDedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashBuckets(t(s, dir, "documents"), "doc_id", "text", bits = 16)

  /** SimHash hamming-ball pairs (banded multi-probe + bit_count verify):
    * EXACT recall for hamming ≤ bands−1 by pigeonhole. Subset-capped like
    * q_dedup_ngram — the word-soup fixture's low simhash entropy makes
    * full-corpus pair counts quadratic at larger SFs (the production
    * guard is maxBucketSize; unlimited here for exact oracle parity). */
  def qDedupSimhashNear(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDup(
      t(s, dir, "documents").filter(col("doc_id") < 300), "doc_id", "text",
      bits = 16, bands = 4, maxHamming = 2)

  /** Image near-dup via dHash hamming-ball over REAL PNGs. The fixture
    * images are built so their dHash is known BY CONSTRUCTION: each doc's
    * target hash is pure arithmetic on doc_id (25 cluster bases whose
    * every byte differs across clusters — inter-cluster hamming ≥ 8,
    * never candidates — plus 0–3 flipped bits per variant), and
    * pngFromDhash emits a 9×8 gradient PNG whose decode→pool→compare
    * path recovers exactly that hash. The Spark side therefore exercises
    * the full PNG encode → javax.imageio decode → pooling → banded-probe
    * pipeline, while the oracle derives the same hashes arithmetically
    * and replays the probe in SQL — a stubbed codec cannot pass.
    * Top byte is mod 128 and flip positions mod 63 so bit 63 stays
    * clear: both engines then agree on sign-free shift arithmetic. */
  def qDedupImage(s: SparkSession, dir: String): DataFrame = {
    val g = pmod(col("doc_id"), lit(25L))
    val v = floor(col("doc_id") / lit(25)).cast("long") // variant 0..7
    val base = (0 until 8).map { j =>
      shiftleft(pmod(g * 11 + lit(j * 17 + 7),
        lit(if (j == 7) 128L else 256L)), j * 8)
    }.reduce(_ bitwiseOR _)
    val flip = (0 until 3).map { k =>
      when(v > k, call_function("shiftleft", lit(1L),
        pmod(v * 9 + lit(k * 13), lit(63L)).cast("int"))).otherwise(lit(0L))
    }.reduce(_ bitwiseXOR _)
    val imgs = t(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"),
        pipeline.expr.ImageExprs.pngFromDhash(base bitwiseXOR flip).as("img"))
    Dedup.imageNearDup(imgs, "doc_id", "img", bands = 8, maxHamming = 3)
  }

  def qDedupNgram(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(
      t(s, dir, "documents").filter(col("doc_id") < 1500), "doc_id", "text",
      nGram = 3, threshold = 0.5)

  def qAnnCosine(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.bruteTopK(emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding", 10)
      .select(col("qid"), col("cid"), col("cos"), col("rank").cast("long").as("rnk"))
  }

  /** Embedding-cosine near-duplicate pairs (dedup family, exact doubles). */
  def qDedupEmbed(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("vb"))
    a.join(b, col("a") < col("b"))
      .withColumn("cos", pipeline.expr.PortableExprs.cosine(col("va"), col("vb")))
      .filter(col("cos") >= 0.4)
      .select("a", "b", "cos")
  }

  def qAnnLsh(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        pipeline.expr.PortableExprs.hyperplaneSig(col("embedding"), 6, 64).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec"))

  /** IVF ANN with FIXED centroids (the first 8 embeddings) so the result is
    * fully deterministic and oracle-checkable — the k-means-trained form
    * (Similarity.ivfTopK) shares every plan shape after centroid fit.
    * Collecting 8 centroid rows to the driver is the broadcast pattern. */
  def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val cents: Seq[Seq[Float]] = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0).toSeq).toSeq
    Similarity.ivfTopKWithCentroids(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, nProbe = 3, cents)
      .select(col("qid"), col("cid"), col("cos"), col("rank").cast("long").as("rnk"))
  }

  /** Embedding near-dup pairs, LSH-gated (the production form of
    * q_dedup_embed — bucket equijoin instead of the all-pairs BNLJ). */
  def qDedupEmbedLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.embedNearDupLsh(t(s, dir, "embeddings"), "vec_id", "embedding",
      threshold = 0.4, planes = 4, dim = 64, tables = 3)

  /** Near-dup APPLY: the corpus with near-duplicate pairs collapsed — for
    * every candidate pair (a < b) the higher id drops, keeping canonical
    * lower-id docs (the standard greedy policy; transitive-closure
    * canonicalization is a connected-components pass layered on the same
    * pairs). Pairs come from the LSH-gated embedding dedup. */
  def qDedupNearApply(s: SparkSession, dir: String): DataFrame = {
    val pairs = qDedupEmbedLsh(s, dir).select(col("b").as("drop_id"))
    t(s, dir, "embeddings")
      .join(pairs.distinct(), col("vec_id") === col("drop_id"), "left_anti")
      .select(col("vec_id"), col("label").cast("long").as("label"))
  }

  /** TRANSITIVE near-dup clusters: connected components over the LSH-gated
    * candidate pairs (component id = min reachable vec_id) — the
    * canonicalization a~b, b~c ⇒ {a,b,c} one cluster. */
  def qDedupComponents(s: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(qDedupEmbedLsh(s, dir))
      .select(col("node").as("vec_id"), col("comp").as("component"))

  /** S3: syslog envelope strip, demonstrated end-to-end (envelope is
    * constructed deterministically so DuckDB can mirror it). */
  def qParseSyslog(s: SparkSession, dir: String): DataFrame = {
    val framed = t(s, dir, "documents").select(
      col("doc_id"),
      concat(lit("<190>Jan  1 00:00:01 web01 nginx: "),
        regexp_replace(col("text"), "\n", " ")).as("payload"))
    pipeline.sources.Sources.stripSyslog(framed)
      .select(col("doc_id"), octet_length(col("payload")).cast("long").as("payload_bytes"))
  }

  def qLangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))

  def qQuality(s: SparkSession, dir: String): DataFrame = {
    // STAGED projection: the features struct is aliased once and its five
    // fields extracted in a separate select — five direct getField
    // references would evaluate the struct (and its tokenization) five
    // times per row (lambda-bearing exprs are outside codegen
    // subexpression elimination; CollapseProject keeps a non-cheap alias
    // referenced more than once in its own Project)
    t(s, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.qualityFeatures(col("text")).as("_f"))
      .select(
        col("doc_id"),
        col("_f.n_tokens").as("n_tokens"),
        col("_f.n_punct").as("n_punct"),
        col("_f.n_stopwords").as("n_stopwords"),
        col("_f.punct_ratio").as("punct_ratio"),
        col("_f.stopword_ratio").as("stopword_ratio"))
  }

  /** Composite quality score (stopword presence ∘ sane token length ∘ low
    * punctuation) + the pass/fail gate a corpus-cleaning config would use
    * — every term is int/int division or IEEE constant arithmetic in a
    * fixed association order, so the doubles are bit-identical across
    * engines (the q1_agg determinism rule). Null text scores the
    * deterministic constant 0.5 on BOTH engines (the ratio defaults fall
    * to 0.0, never null — which is why quality_filter gates on
    * text.isNull explicitly, not on a null score). */
  def qQualityScore(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("q_score"))
      .select(col("doc_id"), col("q_score"),
        (col("q_score") >= 0.5).as("passes_gate"))

  def qTokenCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("ws_tokens"),
      TextAnalysis.bpeTokenCount(col("text")).cast("long").as("bpe_tokens"))

  def qFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"), pipeline.expr.PortableExprs.fingerprint(col("text")).as("fp"))

  /** Grok named-pattern extraction (the normalizer plugin point): a log
    * line synthesized deterministically from doc columns (so DuckDB can
    * mirror it) → ONE-pass typed struct via the compiled grok regex. The
    * oracle SQL embeds the SAME [[pipeline.expr.Grok.compile]] expansion,
    * so the dialect-shared regex cannot drift between engines. */
  val grokPattern: String =
    "ts=%{TIMESTAMP_ISO8601:ts} level=%{LOGLEVEL:level} src=%{WORD:src} " +
      "ip=%{IPV4:ip} status=%{INT:status:int} bytes=%{INT:bytes:long} " +
      "dur=%{NUMBER:dur:double} msg=%{GREEDYDATA:msg}"

  def grokLine: org.apache.spark.sql.Column = concat(
    lit("ts=2026-01-01T00:00:00Z level=INFO src="), col("source"),
    lit(" ip=10.0."), pmod(col("doc_id"), lit(256L)).cast("string"),
    lit("."), pmod(col("doc_id") * 7, lit(256L)).cast("string"),
    lit(" status="), (lit(200L) + pmod(col("doc_id"), lit(5L))).cast("string"),
    lit(" bytes="), col("n_chars").cast("string"),
    lit(" dur="), pmod(col("doc_id"), lit(9L)).cast("string"),
    lit("."), pmod(col("doc_id"), lit(100L)).cast("string"),
    lit(" msg="), substring(col("text"), 1, 12))

  def qGrokExtract(s: SparkSession, dir: String): DataFrame = {
    val g = pipeline.expr.Grok.extract(grokLine, grokPattern)
    t(s, dir, "documents").select(
      col("doc_id"),
      g.getField("ts").as("g_ts"),
      g.getField("level").as("g_level"),
      g.getField("src").as("g_src"),
      g.getField("ip").as("g_ip"),
      g.getField("status").as("g_status"),
      g.getField("bytes").as("g_bytes"),
      g.getField("dur").as("g_dur"),
      g.getField("msg").as("g_msg"))
  }

  /** Journald FIELDED decode (S2): a journald-style JSON entry synthesized
    * deterministically from doc columns → MapType decode (the exact
    * `entries` shape ConfigRunner's journald source produces) → map-lookup
    * filter + aggregate, the EventData-style addressing
    * (`examples/windows/README.md:169`). Null-text docs omit MESSAGE from
    * the JSON (to_json drops nulls), so the map lookup nulls that field —
    * both engines then skip it in the sum. */
  def qJournaldFields(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val line = to_json(struct(
      pmod(col("doc_id"), lit(8L)).cast("string").as("PRIORITY"),
      concat(lit("app-"), col("source"), lit(".service")).as("_SYSTEMD_UNIT"),
      col("text").as("MESSAGE")))
    t(s, dir, "documents")
      .withColumn("entries", from_json(line, MapType(StringType, StringType)))
      .filter(try_element_at(col("entries"), lit("PRIORITY")).cast("long") <= 3)
      .groupBy(try_element_at(col("entries"), lit("_SYSTEMD_UNIT")).as("unit"))
      .agg(count(lit(1)).as("n_entries"),
        sum(length(try_element_at(col("entries"), lit("MESSAGE")))).as("sum_msg_chars"))
  }

  /** HTTPD combined-log line synthesized from doc columns (regex-safe
    * pieces only; doc_id % 10 == 0 rows take the dashed-bytes branch).
    * concat() null-propagates, so null-text docs yield a null line on BOTH
    * engines (DuckDB `||` is also null-propagating) → all-null fields. */
  def httpdLine: org.apache.spark.sql.Column = concat(
    lit("10.1."), pmod(col("doc_id"), lit(256L)).cast("string"),
    lit("."), pmod(col("doc_id") * 3, lit(256L)).cast("string"),
    lit(" - u"), pmod(col("doc_id"), lit(50L)).cast("string"),
    lit(" [01/Jan/2026:12:00:0"), pmod(col("doc_id"), lit(10L)).cast("string"),
    lit(" +0000] \""),
    when(pmod(col("doc_id"), lit(2L)) === 0, lit("GET")).otherwise(lit("POST")),
    lit(" /p/"), col("doc_id").cast("string"),
    lit(" HTTP/1.1\" "), (lit(200L) + pmod(col("doc_id"), lit(5L))).cast("string"),
    lit(" "),
    when(pmod(col("doc_id"), lit(10L)) === 0, lit("-"))
      .otherwise(col("n_chars").cast("string")),
    lit(" \"http://ref.example/"), pmod(col("doc_id"), lit(7L)).cast("string"),
    lit("\" \"UA/"), pmod(col("doc_id"), lit(3L)).cast("string"),
    // alnum+space only: quotes/newlines/backslashes in text would break the
    // quoted-field framing (and a non-matching row would diverge between
    // Java's null group and DuckDB's '' on string fields)
    lit(" t"), substring(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""), 1, 8),
    lit("\""))

  /** Grok classic composition: ONE `%{COMBINEDAPACHELOG}` reference expands
    * the full HTTPD combined-log schema (11 typed fields) — the pattern-base
    * breadth a reveald-shaped pipeline needs daily (the nginx conf,
    * `examples/nginx_json.conf:50-79`, is the JSON twin of this format). */
  def qGrokHttpd(s: SparkSession, dir: String): DataFrame = {
    val g = pipeline.expr.Grok.extract(httpdLine, "%{COMBINEDAPACHELOG}")
    t(s, dir, "documents").select(
      col("doc_id"),
      g.getField("clientip").as("g_clientip"),
      g.getField("auth").as("g_auth"),
      g.getField("timestamp").as("g_ts"),
      g.getField("verb").as("g_verb"),
      g.getField("request").as("g_request"),
      g.getField("httpversion").as("g_httpversion"),
      g.getField("response").as("g_response"),
      g.getField("bytes").as("g_bytes"),
      g.getField("referrer").as("g_referrer"),
      g.getField("agent").as("g_agent"))
  }

  /** RFC 5424 structured-syslog line synthesized from doc columns: procid
    * nil on doc_id%3==0, structured-data nil on odd doc_id (exercising the
    * leftmost-first nil alternation on both engines). */
  def syslog5424Line: org.apache.spark.sql.Column = concat(
    lit("<"), pmod(col("doc_id"), lit(192L)).cast("string"),
    lit(">1 2026-01-01T00:00:"),
    lpad(pmod(col("doc_id"), lit(60L)).cast("string"), 2, "0"),
    lit("Z host"), pmod(col("doc_id"), lit(20L)).cast("string"),
    lit(" app"), pmod(col("doc_id"), lit(5L)).cast("string"),
    lit(" "),
    when(pmod(col("doc_id"), lit(3L)) === 0, lit("-"))
      .otherwise((lit(1000L) + pmod(col("doc_id"), lit(100L))).cast("string")),
    lit(" id"), pmod(col("doc_id"), lit(9L)).cast("string"),
    lit(" "),
    when(pmod(col("doc_id"), lit(2L)) === 0,
      concat(lit("[ex@32473 iut=\""), pmod(col("doc_id"), lit(4L)).cast("string"),
        lit("\"]")))
      .otherwise(lit("-")),
    lit(" t"), substring(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""), 1, 10))

  /** Grok classic composition #3: `%{SYSLOG5424LINE}` — modern structured
    * syslog, the third daily log family next to HTTPD combined and RFC3164
    * ([[qGrokHttpd]], SYSLOGLINE). */
  def qGrokSyslog5424(s: SparkSession, dir: String): DataFrame = {
    val g = pipeline.expr.Grok.extract(syslog5424Line, "%{SYSLOG5424LINE}")
    t(s, dir, "documents").select(
      col("doc_id"),
      g.getField("s5_pri").as("g_pri"),
      g.getField("s5_ver").as("g_ver"),
      g.getField("s5_ts").as("g_ts"),
      g.getField("s5_host").as("g_host"),
      g.getField("s5_app").as("g_app"),
      g.getField("s5_proc").as("g_proc"),
      g.getField("s5_msgid").as("g_msgid"),
      g.getField("s5_sd").as("g_sd"),
      g.getField("s5_msg").as("g_msg"))
  }

  /** PostgreSQL server-log line (stock `%m [%p] ` prefix + optional
    * `user@db `): user@db nil on doc_id%3==0 (background workers), level
    * cycles LOG/ERROR/WARNING/STATEMENT. Every piece a pure function of
    * doc_id. */
  def postgresLine: org.apache.spark.sql.Column = concat(
    lit("2026-01-0"), (pmod(col("doc_id"), lit(9L)) + 1).cast("string"),
    lit(" 12:00:0"), pmod(col("doc_id"), lit(10L)).cast("string"),
    lit("."), lpad(pmod(col("doc_id"), lit(1000L)).cast("string"), 3, "0"),
    lit(" UTC ["), (pmod(col("doc_id"), lit(9000L)) + 1000L).cast("string"),
    lit("] "),
    when(pmod(col("doc_id"), lit(3L)) === 0, lit(""))
      .otherwise(concat(lit("u"), pmod(col("doc_id"), lit(50L)).cast("string"),
        lit("@db"), pmod(col("doc_id"), lit(5L)).cast("string"), lit(" "))),
    when(pmod(col("doc_id"), lit(4L)) === 0, lit("LOG"))
      .when(pmod(col("doc_id"), lit(4L)) === 1, lit("ERROR"))
      .when(pmod(col("doc_id"), lit(4L)) === 2, lit("WARNING"))
      .otherwise(lit("STATEMENT")),
    lit(":  duration: "), pmod(col("doc_id"), lit(500L)).cast("string"),
    lit(" ms  statement: SELECT "), pmod(col("doc_id"), lit(7L)).cast("string"))

  /** Grok classic composition #5: `%{POSTGRESQLLOG}` — the database server
    * log family (stock log_line_prefix), with the optional user@db prefix
    * exercising nil-group parity on both engines. */
  /** Multiline joiner (stages.Multiline) + grok over the JOINED records:
    * each doc synthesizes a throwable split line-per-row (header + 0–3
    * indented frames, the Java-family single-line delivery), the joiner
    * reassembles records by the continuation rule, and JAVATHROWABLE +
    * a frame count parse the reassembled text. The oracle reformulates
    * the join relationally (running header count + ordered string_agg). */
  def qGrokMultiline(s: SparkSession, dir: String): DataFrame = {
    val nFrames = pmod(col("doc_id"), lit(4L))
    val lines = t(s, dir, "documents").filter(col("doc_id") < 300)
      .select(
        concat(lit("app-"), pmod(col("doc_id"), lit(5L))).as("src"),
        col("doc_id"),
        posexplode(concat(
          array(format_string("com.example.Err%d: boom %d",
            pmod(col("doc_id"), lit(7L)), col("doc_id"))),
          slice(transform(sequence(lit(1), lit(3)),
            i => format_string("\tat com.example.Svc%s.call(Svc.java:%s)",
              i, col("doc_id") + i)),
            lit(1), nFrames.cast("int")))).as(Seq("idx", "line")))
      .select(col("src"), (col("doc_id") * 10 + col("idx")).as("off"), col("line"))
    val recs = pipeline.stages.Multiline.joinLines(lines, "src", "off", "line")
    val g = pipeline.expr.Grok.extract(col("rec_text"), "%{JAVATHROWABLE}")
    recs.select(col("source"), col("rec_id"), col("first_offset"),
      col("n_lines"), col("has_header"), col("rec_text"),
      g.getField("jt_exception").as("jt_exception"),
      g.getField("jt_message").as("jt_message"),
      size(filter(split(col("rec_text"), "\n"),
        l => l.rlike("^[ \\t]*at "))).as("n_frames"))
  }

  def qGrokPostgres(s: SparkSession, dir: String): DataFrame = {
    val g = pipeline.expr.Grok.extract(postgresLine, "%{POSTGRESQLLOG}")
    t(s, dir, "documents").select(
      col("doc_id"),
      g.getField("pg_ts").as("g_ts"),
      g.getField("pg_tz").as("g_tz"),
      g.getField("pg_pid").as("g_pid"),
      g.getField("pg_user").as("g_user"),
      g.getField("pg_db").as("g_db"),
      g.getField("pg_level").as("g_level"),
      g.getField("pg_message").as("g_message"))
  }

  /** HAProxy httplog line synthesized from doc columns (every field a pure
    * function of doc_id, request tail from the alnum-cleaned text). */
  def haproxyLine: org.apache.spark.sql.Column = concat(
    lit("10.4."), pmod(col("doc_id"), lit(256L)).cast("string"),
    lit("."), pmod(col("doc_id") * 11, lit(256L)).cast("string"),
    lit(":"), (lit(40000L) + pmod(col("doc_id"), lit(20000L))).cast("string"),
    lit(" [01/Jan/2026:12:00:0"), pmod(col("doc_id"), lit(10L)).cast("string"),
    lit("."), lpad(pmod(col("doc_id"), lit(1000L)).cast("string"), 3, "0"),
    lit("] fe"), pmod(col("doc_id"), lit(3L)).cast("string"),
    lit(" be"), pmod(col("doc_id"), lit(4L)).cast("string"),
    lit("/srv"), pmod(col("doc_id"), lit(6L)).cast("string"),
    lit(" "), pmod(col("doc_id"), lit(9L)).cast("string"),
    lit("/"), pmod(col("doc_id"), lit(7L)).cast("string"),
    lit("/"), pmod(col("doc_id"), lit(5L)).cast("string"),
    lit("/"), pmod(col("doc_id"), lit(11L)).cast("string"),
    lit("/"), (lit(10L) + pmod(col("doc_id"), lit(90L))).cast("string"),
    lit(" "), (lit(200L) + pmod(col("doc_id"), lit(5L))).cast("string"),
    lit(" "), col("n_chars").cast("string"),
    lit(" - - ---- "),
    pmod(col("doc_id"), lit(50L)).cast("string"),
    lit("/"), pmod(col("doc_id"), lit(40L)).cast("string"),
    lit("/"), pmod(col("doc_id"), lit(30L)).cast("string"),
    lit("/"), pmod(col("doc_id"), lit(20L)).cast("string"),
    lit("/"), pmod(col("doc_id"), lit(3L)).cast("string"),
    lit(" "), pmod(col("doc_id"), lit(8L)).cast("string"),
    lit("/"), pmod(col("doc_id"), lit(6L)).cast("string"),
    lit(" \"GET /h/"), col("doc_id").cast("string"),
    lit(" t"), substring(regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""), 1, 8),
    lit("\""))

  /** Grok classic composition #4: `%{HAPROXYHTTPLINE}` — the 20-field
    * HAProxy httplog format. */
  def qGrokHaproxy(s: SparkSession, dir: String): DataFrame = {
    val g = pipeline.expr.Grok.extract(haproxyLine, "%{HAPROXYHTTPLINE}")
    t(s, dir, "documents").select(
      col("doc_id"),
      g.getField("ha_client_ip").as("g_client_ip"),
      g.getField("ha_client_port").as("g_client_port"),
      g.getField("ha_accept_date").as("g_accept_date"),
      g.getField("ha_frontend").as("g_frontend"),
      g.getField("ha_backend").as("g_backend"),
      g.getField("ha_server").as("g_server"),
      g.getField("ha_tq").as("g_tq"),
      g.getField("ha_tt").as("g_tt"),
      g.getField("ha_status").as("g_status"),
      g.getField("ha_bytes").as("g_bytes"),
      g.getField("ha_term_state").as("g_term_state"),
      g.getField("ha_actconn").as("g_actconn"),
      g.getField("ha_retries").as("g_retries"),
      g.getField("ha_srv_queue").as("g_srv_queue"),
      g.getField("ha_request").as("g_request"))
  }

  /** COMPOSITE training-data pipeline: exact-dedup keepers ∘ language
    * allowlist ∘ quality thresholds — the ops composing as one relational
    * plan (one digest shuffle + narrow filters), the shape a corpus-cleaning
    * job actually runs. */
  def qCorpusClean(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val keepers = Dedup.exact(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val f = TextAnalysis.qualityFeatures(col("text"))
    // the quality gate is ONE bound predicate (Portable.bind1): a filter
    // on two aliased feature columns gets predicate-pushed with the alias
    // INLINED per reference — two full feature evaluations per row (plan-
    // verified r7); bound, the struct evaluates once in the filter and
    // once in the surviving-rows projection
    docs.join(keepers, Seq("doc_id"), "left_semi")
      .filter(col("lang").isin("en", "de", "fr"))
      .filter(Portable.bind1(f)(q =>
        q.getField("n_tokens") >= 10 && q.getField("stopword_ratio") > 0))
      .select(col("doc_id"), col("lang"),
        f.getField("n_tokens").as("n_tokens"))
  }

  // ---------- corpus refinement (PII / URL / repetition / sampling) ----------

  /** PII-bearing line synthesized from doc columns (two emails, one IPv4,
    * one phone — all pure functions of doc_id, so the oracle rebuilds the
    * same line; null text null-propagates on both engines). */
  def piiLine: org.apache.spark.sql.Column = concat(
    substring(col("text"), 1, 40),
    lit(" contact u"), pmod(col("doc_id"), lit(40L)).cast("string"),
    lit("@mail.example.org or u"), pmod(col("doc_id"), lit(9L)).cast("string"),
    lit("@corp.example.com ip 10.3."), pmod(col("doc_id"), lit(256L)).cast("string"),
    lit("."), pmod(col("doc_id") * 5, lit(256L)).cast("string"),
    lit(" tel +1-415-555-"),
    lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"))

  /** PII redaction: per-kind match counts + the redacted payload's digest.
    * The oracle runs the SAME Java∩RE2 patterns through DuckDB's regex
    * engine, so a miscounted or half-redacted match cannot pass. */
  def qPiiRedact(s: SparkSession, dir: String): DataFrame = {
    val line = piiLine
    val cnt = CorpusRefine.piiCounts(line)
    val red = CorpusRefine.redactPii(line)
    t(s, dir, "documents").select(
      col("doc_id"),
      cnt.getField("n_emails").as("n_emails"),
      cnt.getField("n_phones").as("n_phones"),
      cnt.getField("n_ips").as("n_ips"),
      md5(red.cast("binary")).as("redacted_md5"),
      length(red).cast("long").as("n_redacted_chars"))
  }

  /** Deterministic messy-URL fixture: uppercase scheme/host, www + default
    * port, tracking params in three positions, optional fragment. */
  def urlLine: org.apache.spark.sql.Column = concat(
    lit("HTTPS://WWW.Example"), pmod(col("doc_id"), lit(5L)).cast("string"),
    lit(".COM:443/Path/"), pmod(col("doc_id"), lit(50L)).cast("string"),
    when(pmod(col("doc_id"), lit(3L)) === 0,
      concat(lit("/?utm_source=feed&id="), pmod(col("doc_id"), lit(7L)).cast("string")))
      .when(pmod(col("doc_id"), lit(3L)) === 1,
        concat(lit("?id="), pmod(col("doc_id"), lit(7L)).cast("string"), lit("&utm_campaign=x")))
      .otherwise(concat(lit("?id="), pmod(col("doc_id"), lit(7L)).cast("string"))),
    when(pmod(col("doc_id"), lit(4L)) === 0, lit("#frag")).otherwise(lit("")))

  /** URL canonicalization, row level. */
  def qUrlCanonical(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"), CorpusRefine.canonicalizeUrl(urlLine).as("url_canon"))

  /** URL-keyed dedup: the three tracking variants of each logical URL must
    * collapse to one canonical group (keep lowest id). */
  def qUrlDedup(s: SparkSession, dir: String): DataFrame =
    CorpusRefine.urlDedup(
      t(s, dir, "documents").select(col("doc_id"), urlLine.as("url")),
      "doc_id", "url")

  /** Gopher-style repetition features (top-bigram fraction etc.). */
  def qRepetition(s: SparkSession, dir: String): DataFrame =
    CorpusRefine.repetitionFeatures(t(s, dir, "documents"), "doc_id", "text")

  /** Corpus-wide paragraph dedup (CCNet-shaped): 3-word chunks, first
    * occurrence wins across the whole corpus. */
  def qParagraphDedup(s: SparkSession, dir: String): DataFrame =
    CorpusRefine.paragraphDedup(t(s, dir, "documents"), "doc_id", "text", k = 3)

  /** Paragraph-dedup APPLY: the rewritten corpus (kept chunks re-joined in
    * original order). */
  def qParagraphApply(s: SparkSession, dir: String): DataFrame =
    CorpusRefine.paragraphDedupApply(t(s, dir, "documents"), "doc_id", "text", k = 3)

  /** Rational TF-IDF top-3 salient terms per doc (log-free score
    * `tf·N/df` — IEEE-exact across engines; see CorpusRefine.tfidfTopK). */
  def qTfidf(s: SparkSession, dir: String): DataFrame =
    CorpusRefine.tfidfTopK(t(s, dir, "documents"), "doc_id", "text", k = 3)

  /** COMPOSITE corpus assembly: URL-dedup keepers ∘ language allowlist ∘
    * repetition filter (native one-pass stats, narrow) ∘ deterministic
    * stratified sampling — the corpus-refinement ops composing into ONE
    * plan, the q_corpus_clean pattern for the round-3 family. */
  def qCorpusAssemble(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val urlKeep = CorpusRefine.urlDedup(
      docs.select(col("doc_id"), urlLine.as("url")), "doc_id", "url")
      .select(col("keep_id").as("doc_id"))
    // repetition gate as ONE bound predicate (Portable.bind1): the alias
    // form was predicate-pushed below the semi join with `_st` inlined
    // THREE times (isNotNull + two field refs) — three native-expr
    // evaluations per scanned row (plan-verified r7); bound, it is one
    val base = docs.join(urlKeep, Seq("doc_id"), "left_semi")
      .filter(col("lang").isin("en", "de", "fr"))
      .filter(Portable.bind1(
        pipeline.expr.PortableExprs.repetitionStats(col("text")))(st =>
        st.isNotNull && st.getField("top_bigram_n").cast("double") /
          st.getField("n_bigrams").cast("double") < 0.5))
      .withColumn("_st", pipeline.expr.PortableExprs.repetitionStats(col("text")))
    CorpusRefine.stratifiedSample(base, "doc_id", "lang",
      Map("en" -> 50, "de" -> 30), defaultRate = 10)
      .select(col("doc_id"), col("lang"), col("_st.n_words").as("n_words"))
  }

  /** Token-budget shard packing (distributed prefix sum — see
    * CorpusRefine.packTokenShards): docs → ~1000-token training shards. */
  def qPackShards(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents").select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    CorpusRefine.packTokenShards(toks, "doc_id", "n_tokens",
      budget = 1000L, buckets = 8)
  }

  /** REAL token-ID emission + lossless round-trip: every doc encoded to
    * its byte-level BPE id sequence, then DECODED BACK — the oracle pins
    * `decoded = text` byte for byte (byte-level ids cover whitespace, so
    * decode∘encode is the identity; a wrong merge, id, or pretoken
    * boundary shows up as a diff). Exact id SEQUENCES are pinned against
    * an independent applier in BpeSpec — iterative merge loops aren't
    * SQL-expressible, the round-trip is. */
  def qBpeEncode(s: SparkSession, dir: String): DataFrame = {
    import pipeline.expr.Bpe
    t(s, dir, "documents")
      .withColumn("ids", Bpe.bpeEncode(col("text"), Bpe.FixtureByteLevel))
      .select(col("doc_id"),
        Bpe.bpeDecode(col("ids"), Bpe.FixtureByteLevel).as("decoded"),
        (size(col("ids")) >= 1 &&
          size(col("ids")) <= octet_length(col("text"))).as("ids_bounded"))
  }

  /** Trainer-shard emission end-to-end: encode → pack → per-shard
    * reassembly. Budgets use the ws token count (SQL-expressible) so the
    * DuckDB oracle derives the SAME shard boundaries from its own prefix
    * sum, then rebuilds each shard's exact text with an ordered
    * string_agg — every id array must decode byte-identically AND land in
    * the right shard at the right position. The production writer budgets
    * on size(ids) (CorpusRefine.emitTokenShards; spec + 1M drill). */
  def qTokenShards(s: SparkSession, dir: String): DataFrame = {
    import pipeline.expr.Bpe
    val enc = t(s, dir, "documents").select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      Bpe.bpeEncode(col("text"), Bpe.FixtureByteLevel).as("ids"))
    CorpusRefine.packTokenShards(enc, "doc_id", "n_tokens",
      budget = 1000L, buckets = 8, carryCols = Seq("ids"))
      .withColumn("decoded", Bpe.bpeDecode(col("ids"), Bpe.FixtureByteLevel))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("doc_id"), col("decoded")))),
            x => x("decoded")), "").as("shard_text"))
  }

  /** Exact-substring duplication stats (Lee et al. 2022 family): per-doc
    * fraction of 8-token windows occurring ≥2 times corpus-wide, plus the
    * quality-gate survivor count cross-check. Short docs report zero
    * windows and always pass — never-vanish. */
  def qDupSpans(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.duplicateSpanStats(docs, "doc_id", "text", k = 8)
      .filter(col("n_dup_grams") > 0)
  }

  /** Stupid-backoff n-gram LM (CCNet quality-scoring family): train a
    * 3-gram model on the corpus itself (minCount 2), score every doc,
    * emit the INTEGER detail (per-level match counts + matched num/den
    * sums) — the join/backoff logic is the oracle surface; the IEEE
    * perplexity step is spec-pinned instead (NgramLm class doc). */
  def qNgramLm(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val model = pipeline.ops.NgramLm.train(docs, "text", 3, minCount = 2L)
    pipeline.ops.NgramLm.scoreDetail(docs, "doc_id", "text", model, 3)
      .drop("sum_log_q6")
  }

  /** Exact-substring REMOVAL (Lee et al. apply): one canonical occurrence
    * of each duplicated 8-token window survives (min (doc_id, pos));
    * non-canonical occurrences' tokens are cut and the doc keeps its
    * remainder. Untouched docs keep byte-original text. */
  def qDupSpansApply(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicateSpanApply(t(s, dir, "documents")
        .select("doc_id", "text"), "doc_id", "text", k = 8)
      .select(col("doc_id"), col("text"), col("n_removed_tokens"))

  /** Fixed-context sequence packing — the trainer input shape: per-token
    * portable ids (h32 of each ws token, EOS −1 between docs), documents
    * concatenated in doc_id order, chunked into rows of exactly 64 ids
    * (remainder dropped). The oracle rebuilds the identical global token
    * stream from ITS OWN prefix sum and aligned unnest — any wrong slice
    * boundary, piece order, or offset breaks the per-sequence CSV
    * equality. Production callers feed BPE id arrays
    * (CorpusRefine.emitTokenShards → packSequences); the portable-hash
    * ids here exist so the oracle can derive the same stream in SQL. */
  def qPackSequences(s: SparkSession, dir: String): DataFrame = {
    val enc = t(s, dir, "documents")
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        transform(
          filter(Portable.tokens(col("text")), w => w =!= ""),
          w => Portable.hash32(w)).as("ids"))
    CorpusRefine.packSequences(enc, "doc_id", "ids", seqLen = 64)
      .select(col("seq"), col("n_ids"),
        array_join(transform(col("ids"), i => i.cast("string")), ",").as("ids_csv"))
  }

  /** Benchmark decontamination: docs sharing ≥ 5 distinct 3-gram shingles
    * with the held-out "benchmark" slice (doc_id % 50 == 0), benchmark
    * docs themselves excluded from the report. */
  def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    CorpusRefine.decontaminate(
      docs.filter(pmod(col("doc_id"), lit(50L)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(50L)) === 0),
      "doc_id", "text", nGram = 3, minShared = 5L)
  }

  /** Deterministic stratified sample: downweight overrepresented strata
    * (en 50%, de 30%, rest 10%) via the portable hash gate. */
  def qSampleStratified(s: SparkSession, dir: String): DataFrame =
    CorpusRefine.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
      Map("en" -> 50, "de" -> 30), defaultRate = 10)
      .select(col("doc_id"), col("lang"))

  /** Multimodal plumbing: opaque binary payload + portable features. */
  def qMultimodal(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"))

  /** REAL audio codec round-trip (JDK `javax.sound.sampled`, zero external
    * jars): a deterministic (doc_id-derived) 16-bit PCM WAV is ENCODED per
    * row, then its header is DECODED back — the oracle knows the expected
    * rate/channels/frames (pure functions of doc_id) and the 4-byte RIFF
    * magic, so a stubbed codec cannot pass. Compressed audio and video
    * stay documented stubs (pipeline.ops.Multimodal.Codecs). */
  def qMultimodalAudio(s: SparkSession, dir: String): DataFrame = {
    val rate = (lit(8000L) + pmod(col("doc_id"), lit(4L)) * 4000L).cast("int")
    val ch = (pmod(col("doc_id"), lit(2L)) + 1).cast("int")
    val frames = (pmod(col("doc_id"), lit(100L)) + 50).cast("int")
    val wav = pipeline.expr.AudioExprs.wavEncode(rate, ch, frames)
    val hdr = pipeline.expr.AudioExprs.wavHeader(wav)
    t(s, dir, "documents").select(
      col("doc_id"),
      hdr.getField("sample_rate").as("sample_rate"),
      hdr.getField("channels").as("n_channels"),
      hdr.getField("frames").as("n_frames"),
      // duration in ms: exact integer floor-division range (≤ 149·1000),
      // expressed as floor of a double division on both engines
      floor(hdr.getField("frames").cast("double") * 1000.0 /
        hdr.getField("sample_rate").cast("double")).cast("long").as("duration_ms"),
      hdr.getField("format").as("audio_format"),
      hex(substring(wav, 1, 4)).as("magic_hex"))
  }

  /** REAL video container-header round-trip (pure-byte ISO-BMFF box walk,
    * zero codec libraries): a deterministic (doc_id-derived) minimal MP4 is
    * ENCODED per row, then its moov/mvhd timescale+duration and trak/tkhd
    * dims are DECODED back by the box walk — the oracle knows every field
    * as a pure function of doc_id plus the literal 'ftyp' magic at offset
    * 4, so a stubbed/checksum-fake codec cannot pass. Frame pixel decode
    * stays the one documented stub (needs a real codec binding). */
  def qMultimodalVideo(s: SparkSession, dir: String): DataFrame = {
    val timescale = (lit(600L) + pmod(col("doc_id"), lit(4L)) * 600L).cast("int")
    val durTicks = (pmod(col("doc_id"), lit(500L)) + 100L) * 6L
    val w = (pmod(col("doc_id"), lit(320L)) + 16L).cast("int")
    val h = (pmod(col("doc_id"), lit(240L)) + 16L).cast("int")
    val mp4 = pipeline.expr.Mp4Exprs.mp4Encode(timescale, durTicks, w, h)
    val hdr = pipeline.expr.Mp4Exprs.mp4Header(mp4)
    t(s, dir, "documents").select(
      col("doc_id"),
      hdr.getField("brand").as("brand"),
      hdr.getField("timescale").as("timescale"),
      hdr.getField("duration").as("duration_ticks"),
      floor(hdr.getField("duration").cast("double") * 1000.0 /
        hdr.getField("timescale").cast("double")).cast("long").as("duration_ms"),
      hdr.getField("width").as("vid_w"),
      hdr.getField("height").as("vid_h"),
      hex(substring(mp4, 5, 4)).as("magic_hex"))
  }

  /** REAL image codec round-trip (JDK `javax.imageio`, zero external jars):
    * a deterministic (doc_id-derived) PNG is ENCODED per row, then its
    * header is DECODED back — the oracle knows the expected dims (pure
    * functions of doc_id) and the 8-byte PNG signature, so a fake/stubbed
    * codec cannot pass. Audio/video stay documented stubs
    * (pipeline.ops.Multimodal.Codecs). */
  def qMultimodalImage(s: SparkSession, dir: String): DataFrame = {
    val w = (pmod(col("doc_id"), lit(64L)) + 1).cast("int")
    val h = (pmod(col("doc_id"), lit(48L)) + 1).cast("int")
    val png = pipeline.expr.ImageExprs.pngEncode(w, h)
    val dims = pipeline.expr.ImageExprs.imageDims(png)
    t(s, dir, "documents").select(
      col("doc_id"),
      dims.getField("width").as("img_w"),
      dims.getField("height").as("img_h"),
      dims.getField("format").as("img_format"),
      hex(substring(png, 1, 8)).as("magic_hex"))
  }
}
