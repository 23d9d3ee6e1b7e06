package pipeline.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming APPROXIMATE near-duplicate dedup — the streaming twin of the
 * batch `dedup_near` chain (minhashLsh → connectedComponents → drop
 * non-representatives, pipeline.config.TransformCompiler), which is
 * batch-only because the transitive closure iterates with driver-side
 * convergence checks.
 *
 * Single-pass form: each document claims its MinHash LSH band keys
 * (IDENTICAL band derivation to Dedup.minhashLsh — md5 of each
 * signature slice — and state is keyed on (band, bkey), the batch
 * join's exact key pair, so the collision structure is bit-for-bit the
 * batch one — a cross-band md5 coincidence cannot conflate ownership);
 * a band key's FIRST claimant (event-time order within a micro-batch,
 * state across micro-batches) owns it, and a document is KEPT iff it
 * owns every band it claims — i.e. dropped iff ANY of its bands was
 * already claimed by a different document, exactly the pairwise edge
 * rule that feeds the batch closure. State is one entry per distinct
 * (band, key) inside the watermark horizon (a 128-bit owner id — the
 * batch Dedup.nid128 identity, two longs, so the 10¹²-doc birthday
 * math matches batch; never text), expired by event-time timeout.
 *
 * What the approximation MISSES vs the batch chain (documented, pinned
 * in StreamingSpec):
 *
 *  - cross-band TRANSITIVE merges: if A and B share no band but C
 *    bridges them (A~C on one band, B~C on another), the batch closure
 *    keeps ONE of {A,B,C}; the streaming form keeps A and B (neither
 *    collides with an earlier doc) and drops only C. Kept count per
 *    component = number of arrival-order "roots", not 1.
 *  - KEEPER IDENTITY: the batch keeper is the component's minimum hash
 *    id; the streaming keeper is the FIRST-ARRIVED doc. Same kept
 *    COUNT on collision-clique components (e.g. exact-duplicate
 *    classes), possibly different representatives.
 *  - HORIZON: duplicates farther apart than the watermark delay than
 *    their original re-enter (state expired) — the dedupDocs contract.
 *  - LATE ROWS are ADMITTED: flatMapGroupsWithState on Spark 4.1.2 has
 *    no late-input filter (measured and pinned in StreamingSpec, the
 *    same result as the Batcher admission-invariance measurement), so a
 *    sub-watermark backfill row is judged against CURRENT state — it may
 *    be kept even where the batch closure over all time would have
 *    dropped it (its original's band state can already have expired),
 *    and its older event time must never shrink a band's horizon (the
 *    monotone-timeout fold in the state function guarantees that).
 *
 * Like the batch transform, rows that cannot carry a signature (null
 * text, < nGram words → null sig, or null event time) BYPASS: they are
 * emitted with ok=true, band=-1 and never enter the band state (the
 * never-vanish guarantee). Identical rows (same url/warc_ts/source/text
 * → same 128-bit node id) are kept or dropped TOGETHER, as in batch —
 * and each copy keeps ITS OWN lang through [[finalize]] (lang is not
 * part of the node id; batch left_anti preserves per-row lang, so the
 * re-emit here must too).
 *
 * Cost note vs batch: the batch form shuffles bare ids+signatures; here
 * the band explode carries the doc payload once (text rides only the
 * band-0 row; the other bands are skinny) through the one stateful
 * shuffle, and [[finalize]] reassembles per micro-batch — a per-doc
 * reduce that is batch-local because all of a doc's band rows explode
 * inside one micro-batch.
 *
 * Usage: `verdicts(stream).writeStream.foreachBatch { (b, _) =>
 * NearDedup.finalize(b.toDF).write...(…) }` — the finalize step cannot
 * live inside the streaming plan (it would be a second stateful
 * aggregate; Spark's multi-stateful support does not cover FMGWS
 * chains).
 */
object NearDedup {

  /** One exploded band claim; text rides only band 0. The node id is the
    * batch 128-bit identity ([[pipeline.ops.Dedup.nid128]]) split into
    * its two long halves. */
  final case class BandRow(nid1: Long, nid2: Long, band: Int, bkey: String,
                           url: String, warc_ts: java.sql.Timestamp,
                           text: String, lang: String, source: String)

  /** Band-key state: the owning 128-bit node id plus the NEWEST claim
    * time seen — the timeout must never move backward (a late-but-valid
    * claim with an older event time would otherwise SHORTEN the dedup
    * horizon for everyone sharing the band). 24 bytes/entry (was 16 with
    * a 64-bit owner — the collision-safety cost, still bounded by the
    * horizon's distinct band keys). */
  final case class BandState(firstNid1: Long, firstNid2: Long, maxSeenMs: Long)

  /** Per-band verdict: ok = this doc owns the band. band = -1 marks a
    * bypass row (no signature / no event time), always ok. */
  final case class Verdict(nid1: Long, nid2: Long, band: Int, ok: Boolean,
                           url: String, warc_ts: java.sql.Timestamp,
                           text: String, lang: String, source: String)

  /**
   * The stateful pass: doc stream (url, warc_ts, text, lang[, source]) →
   * per-band [[Verdict]] stream. Pair with [[finalize]] inside
   * foreachBatch for the kept-docs frame.
   */
  def verdicts(docStream: DataFrame, delayMs: Long = 3600000L,
               nGram: Int = 3, bands: Int = 4, rowsPerBand: Int = 4): Dataset[Verdict] = {
    require(delayMs >= 0, s"delayMs must be >= 0, got $delayMs")
    require(nGram >= 1 && bands >= 1 && rowsPerBand >= 1,
      s"bad nGram/bands/rowsPerBand: $nGram/$bands/$rowsPerBand")
    val spark = docStream.sparkSession
    import spark.implicits._
    val numHashes = bands * rowsPerBand
    val src =
      if (docStream.columns.contains("source")) docStream
      else docStream.withColumn("source", lit(null).cast("string"))
    // participation gate, expressed WITHOUT the signature: the native sig
    // is null ⟺ the text has fewer than nGram whitespace tokens (the
    // shingle rule) or is null — the same split/trim tokenization, so the
    // cheap predicate and sig nullability agree by construction. This
    // keeps the md5-per-shingle signature work off the bypass branch
    // entirely (the judged/bypass split is a streaming self-union, so
    // each branch re-reads the micro-batch; the second read now carries
    // only this cheap filter — the price of the never-vanish bypass).
    val canSig = col("warc_ts").isNotNull && col("text").isNotNull &&
      size(split(trim(col("text")), "\\s+")) >= nGram
    val base = src
      .select(col("url"), col("warc_ts"), col("text"), col("lang"), col("source"))
      // node id: the batch dedup_near key (Dedup.nid128 — identical rows
      // share one id and one fate; 128-bit for the same birthday math)
      .withColumn("_nid", pipeline.ops.Dedup.nid128(col("url"),
        col("warc_ts").cast("string"), col("source"), col("text")))
      .withWatermark("warc_ts", s"$delayMs milliseconds")
    val sig = pipeline.expr.PortableExprs.minhashSig(col("text"), nGram, numHashes)
    val banded = base.filter(canSig)
      .select(col("_nid"), col("url"), col("warc_ts"), col("text"),
        col("lang"), col("source"),
        // the EXACT batch band keys — the shared derivation, not a copy
        posexplode(pipeline.ops.Dedup.bandKeys(sig, bands, rowsPerBand))
          .as(Seq("band", "bkey")))
      .select(col("_nid.h1").as("nid1"), col("_nid.h2").as("nid2"),
        col("band"), col("bkey"),
        col("url"), col("warc_ts"),
        when(col("band") === 0, col("text")).as("text"),
        col("lang"), col("source"))
      .as[BandRow]
    val judged = banded
      // state key = (band, bkey) — the batch join's key PAIR: bkey alone
      // would let a cross-band md5 coincidence conflate ownership across
      // bands, an edge the batch equijoin cannot produce
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState[BandState, Verdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, String), rows: Iterator[BandRow], state: GroupState[BandState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // deterministic intra-batch order: event time, then node id —
            // the first row claims a previously unowned band
            val rs = rows.toVector.sortBy(r => (r.warc_ts.getTime, r.nid1, r.nid2))
            // stale state counts as expired even on the DATA path: the
            // event-time timeout only sweeps groups with NO input in the
            // sweeping batch, so without this check the horizon would
            // depend on whether a quiet batch happened to run between the
            // original and the late duplicate — ownership older than the
            // horizon must lapse either way (pinned in StreamingSpec's
            // horizon-expiry test)
            val wm = state.getCurrentWatermarkMs()
            val prev = state.getOption.filter(st => wm <= st.maxSeenMs + delayMs)
            val (w1, w2) = prev.map(st => (st.firstNid1, st.firstNid2))
              .getOrElse((rs.head.nid1, rs.head.nid2))
            // monotone horizon: fold the batch max into the stored max so
            // a late-but-valid claim (older ts admitted above the
            // watermark) can never pull the expiry EARLIER
            var maxTs = prev.map(_.maxSeenMs).getOrElse(0L)
            val out = rs.map { r =>
              maxTs = math.max(maxTs, r.warc_ts.getTime)
              Verdict(r.nid1, r.nid2, r.band, r.nid1 == w1 && r.nid2 == w2,
                r.url, r.warc_ts, r.text, r.lang, r.source)
            }
            state.update(BandState(w1, w2, maxTs))
            // expire once the watermark passes the horizon behind the
            // newest claim (must stay strictly ahead of the watermark)
            state.setTimeoutTimestamp(
              math.max(maxTs + delayMs, wm + 1))
            out.iterator
          }
      }
    val bypass = base.filter(!canSig)
      .select(col("_nid.h1").as("nid1"), col("_nid.h2").as("nid2"),
        lit(-1).as("band"), lit(true).as("ok"),
        col("url"), col("warc_ts"), col("text"), col("lang"), col("source"))
      .as[Verdict]
    judged.unionByName(bypass)
  }

  /**
   * Micro-batch finalize (call inside foreachBatch): per-doc reduce of the
   * band verdicts — kept iff ok on EVERY band — plus the bypass rows
   * verbatim. Batch-local by construction: a doc's band rows cannot split
   * across micro-batches (they explode from one input row).
   */
  def finalize(verdicts: DataFrame): DataFrame = {
    val real = verdicts.filter(col("band") >= 0)
      .groupBy(col("nid1"), col("nid2"))
      .agg(min(when(col("ok"), lit(1)).otherwise(lit(0))).as("_all"),
        first(col("url")).as("url"),
        first(col("warc_ts")).as("warc_ts"),
        first(col("text"), ignoreNulls = true).as("text"),
        first(col("source")).as("source"),
        // identical rows share a nid; re-emit ONE row per input copy
        // (band-0 rows carry the text, one per copy), each with ITS OWN
        // lang — lang is outside the node id, so copies may differ in it
        // and the batch left_anti preserves each row's value; a
        // first(lang) here would stamp one copy's lang onto all
        // (collect_list skips the nulls of non-band-0 rows; the struct
        // wrapper keeps a genuinely-null lang inside a kept element)
        collect_list(when(col("band") === 0, struct(col("lang")))).as("_copies"))
      .filter(col("_all") === 1)
      .select(col("url"), col("warc_ts"), col("text"), col("source"),
        explode(col("_copies")).as("_c"))
      .select(col("url"), col("warc_ts"), col("text"),
        col("_c.lang").as("lang"), col("source"))
    verdicts.filter(col("band") < 0)
      .select("url", "warc_ts", "text", "lang", "source")
      .unionByName(real)
  }

  // ---------- image twin: streaming dHash near-dup over binary payloads ----

  /** One exploded band claim for the IMAGE stream; the binary payload and
    * text ride only band 0 (the sentinel band of undecodable images is
    * also 0 — its bkey is the per-doc "u:" key, so it is that doc's one
    * payload-carrying row). `sh` is None only on sentinel rows. */
  final case class ImgBandRow(nid1: Long, nid2: Long, band: Int, bkey: String,
                              sh: Option[Long],
                              url: String, warc_ts: java.sql.Timestamp,
                              html: Array[Byte], text: String, lang: String,
                              source: String)

  /** Image band-key state: owner's 128-bit node id, the owner's FULL
    * 64-bit dHash (8 bytes — cheap enough to store, and it buys an EXACT
    * `bit_count(xor) ≤ maxHamming` verify against the owner, matching the
    * batch imageNearDup verify instead of the text twin's verify-free band
    * collision), plus the monotone max claim time. ~32 bytes/entry. */
  final case class ImgBandState(firstNid1: Long, firstNid2: Long,
                                sh: Option[Long], maxSeenMs: Long)

  /** Per-band image verdict; band = -1 marks a bypass row (null html or
    * null event time), always ok. */
  final case class ImgVerdict(nid1: Long, nid2: Long, band: Int, ok: Boolean,
                              url: String, warc_ts: java.sql.Timestamp,
                              html: Array[Byte], text: String, lang: String,
                              source: String)

  /**
   * Streaming approximate near-duplicate IMAGE dedup — the dHash twin of
   * [[verdicts]], and the streaming twin of the batch
   * `pipeline.ops.Dedup.imageNearDup` pair generator: each image claims
   * its `bands` contiguous dHash bit-slices (the EXACT batch band
   * derivation, `Dedup.hammingBandSlices` — shared code, not a copy); a
   * slice's first claimant owns it, and a later claimant is dropped iff
   * it collides on ANY band with an owner whose full dHash is within
   * `maxHamming` bits (`Long.bitCount(xor)` — the batch verify, exact).
   * Collision-but-outside-ball claimants are kept and do NOT take
   * ownership.
   *
   * Approximations vs the batch imageNearDup→closure chain, beyond the
   * text twin's documented set (cross-band bridges, first-arrival keeper,
   * horizon, late-row admission):
   *
   *  - OWNER-ONLY VERIFY: within one band bucket, every claimant is
   *    verified against the FIRST owner only. If A owns a band, B
   *    collides at hamming(A,B) > maxHamming (kept, not owner), and C
   *    then collides at hamming(B,C) ≤ maxHamming but hamming(A,C) >
   *    maxHamming, the batch pair (B,C) exists but the streaming form
   *    keeps C — pinned in StreamingSpec. (The batch bucket verifies all
   *    pairs; streaming state holds one owner per band key.)
   *
   * Never-vanish: rows with null html or null event time bypass (band
   * -1, ok). Images that DECODE TO NO dHASH (corrupt bytes, < 9×8 px)
   * claim one per-doc sentinel key ("u:" + node id — disjoint from the
   * numeric slice keyspace) instead of real bands: they flow through the
   * same state pass (one bounded entry each, expiring on the horizon like
   * any band) and are always kept, WITHOUT a second decode — a
   * bypass-side `dhash IS NULL` filter would re-run the decode on the
   * self-union's second read of the micro-batch, the minhashLsh hazard.
   * For the same reason the judged branch computes the dHash exactly ONCE
   * per row: the band array is built inside a single-element
   * `transform(array(dhash), h => …)` whose lambda BINDS the decoded
   * value — naming the hash in a projection and referencing it from the
   * slice transform would let CollapseProject re-inline the decode once
   * per band (9 decodes/row at bands=8).
   *
   * Identity: nid128 over (url, warc_ts, source, html, text) — identical
   * rows share one fate, batch-style. Pair with [[finalizeImage]] inside
   * foreachBatch.
   */
  def imageVerdicts(docStream: DataFrame, delayMs: Long = 3600000L,
                    bands: Int = 8, maxHamming: Int = 3): Dataset[ImgVerdict] = {
    require(delayMs >= 0, s"delayMs must be >= 0, got $delayMs")
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    val spark = docStream.sparkSession
    import spark.implicits._
    // image corpora commonly land without caption/lang sidecars — default
    // the optional doc columns to null rather than failing the bind
    val src = Seq("source", "text", "lang").foldLeft(docStream)((d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast("string")))
    val canJudge = col("warc_ts").isNotNull && col("html").isNotNull
    val base = src
      .select(col("url"), col("warc_ts"), col("html"), col("text"),
        col("lang"), col("source"))
      .withColumn("_nid", pipeline.ops.Dedup.nid128(col("url"),
        col("warc_ts").cast("string"), col("source"), col("html"), col("text")))
      .withWatermark("warc_ts", s"$delayMs milliseconds")
    // ONE decode per row (see scaladoc): the single-element transform binds
    // the decoded hash as `h`; every reference below is to the bound value.
    // Element type: struct(sh, bkey) — pos from posexplode is the band
    // index for real slices; the sentinel (undecodable) array has one
    // element with a null bkey, rewritten to the per-doc "u:" key below.
    val bandStructs = element_at(
      transform(array(pipeline.expr.ImageExprs.dhash(col("html"))), h =>
        when(h.isNotNull,
          transform(pipeline.ops.Dedup.hammingBandSlices(h, 64, bands),
            k => struct(h.as("sh"), k.cast("string").as("bkey"))))
        .otherwise(array(struct(h.as("sh"),
          lit(null).cast("string").as("bkey"))))),
      1)
    val banded = base.filter(canJudge)
      .select(col("_nid"), col("url"), col("warc_ts"), col("html"),
        col("text"), col("lang"), col("source"),
        posexplode(bandStructs).as(Seq("band", "bs")))
      .select(col("_nid.h1").as("nid1"), col("_nid.h2").as("nid2"),
        col("band"),
        coalesce(col("bs.bkey"),
          concat(lit("u:"), col("_nid.h1"), lit(":"), col("_nid.h2"))).as("bkey"),
        col("bs.sh").as("sh"),
        col("url"), col("warc_ts"),
        when(col("band") === 0, col("html")).as("html"),
        when(col("band") === 0, col("text")).as("text"),
        col("lang"), col("source"))
      .as[ImgBandRow]
    val judged = banded
      .groupByKey(r => (r.band, r.bkey))
      .flatMapGroupsWithState[ImgBandState, ImgVerdict](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, String), rows: Iterator[ImgBandRow], state: GroupState[ImgBandState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rs = rows.toVector.sortBy(r => (r.warc_ts.getTime, r.nid1, r.nid2))
            // stale state counts as expired on the DATA path too — the
            // text twin's horizon rule, same reasoning
            val wm = state.getCurrentWatermarkMs()
            val prev = state.getOption.filter(st => wm <= st.maxSeenMs + delayMs)
            val (w1, w2, wsh) = prev
              .map(st => (st.firstNid1, st.firstNid2, st.sh))
              .getOrElse((rs.head.nid1, rs.head.nid2, rs.head.sh))
            var maxTs = prev.map(_.maxSeenMs).getOrElse(0L)
            val out = rs.map { r =>
              maxTs = math.max(maxTs, r.warc_ts.getTime)
              val owns = r.nid1 == w1 && r.nid2 == w2
              // dropped iff a DIFFERENT owner holds the band AND the full
              // hashes are within the ball — the batch pair rule. Sentinel
              // keys embed the nid, so a non-owning sentinel claimant is
              // impossible (owns is always true there).
              val withinBall = (r.sh, wsh) match {
                case (Some(a), Some(b)) => java.lang.Long.bitCount(a ^ b) <= maxHamming
                case _ => false
              }
              ImgVerdict(r.nid1, r.nid2, r.band, owns || !withinBall,
                r.url, r.warc_ts, r.html, r.text, r.lang, r.source)
            }
            state.update(ImgBandState(w1, w2, wsh, maxTs))
            state.setTimeoutTimestamp(math.max(maxTs + delayMs, wm + 1))
            out.iterator
          }
      }
    val bypass = base.filter(!canJudge)
      .select(col("_nid.h1").as("nid1"), col("_nid.h2").as("nid2"),
        lit(-1).as("band"), lit(true).as("ok"),
        col("url"), col("warc_ts"), col("html"), col("text"),
        col("lang"), col("source"))
      .as[ImgVerdict]
    judged.unionByName(bypass)
  }

  /**
   * Micro-batch finalize for [[imageVerdicts]]: kept iff ok on EVERY
   * claimed band, plus bypass rows verbatim — [[finalize]]'s shape with
   * the binary payload carried. Payload rides the band-0 row (real bands)
   * or the single sentinel row (band 0 by construction), so
   * `first(ignoreNulls)` per nid recovers it; identical copies re-emit
   * one row each with their OWN lang, the batch left_anti contract.
   */
  def finalizeImage(verdicts: DataFrame): DataFrame = {
    val real = verdicts.filter(col("band") >= 0)
      .groupBy(col("nid1"), col("nid2"))
      .agg(min(when(col("ok"), lit(1)).otherwise(lit(0))).as("_all"),
        first(col("url")).as("url"),
        first(col("warc_ts")).as("warc_ts"),
        first(col("html"), ignoreNulls = true).as("html"),
        first(col("text"), ignoreNulls = true).as("text"),
        first(col("source")).as("source"),
        collect_list(when(col("band") === 0, struct(col("lang")))).as("_copies"))
      .filter(col("_all") === 1)
      .select(col("url"), col("warc_ts"), col("html"), col("text"),
        col("source"), explode(col("_copies")).as("_c"))
      .select(col("url"), col("warc_ts"), col("html"), col("text"),
        col("_c.lang").as("lang"), col("source"))
    verdicts.filter(col("band") < 0)
      .select("url", "warc_ts", "html", "text", "lang", "source")
      .unionByName(real)
  }
}
