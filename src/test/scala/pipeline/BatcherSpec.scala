package pipeline

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import pipeline.fixtures.Webtext
import pipeline.streaming.Batcher
import pipeline.streaming.Batcher.{BState, Flush}

/** The count/time batcher (reference batchSize+flushFreq semantics):
  * pure-transition unit tests + a streaming run over the routed stream. */
class BatcherSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(4, 4, "batcher-spec")
  private def sc = { spark.sparkContext.setLogLevel("ERROR"); spark }

  test("pure step: count flushes, time flush, carry-over, sequence") {
    // 250 events, batch 100 → two count flushes + 50 carried
    val (f1, s1) = Batcher.step("s3", None, 250, 1000L, 100, 30000L, watermarkMs = 0L)
    assert(f1.map(_.n_events) == Seq(100, 100))
    assert(f1.forall(_.trigger == "count") && f1.map(_.seq) == Seq(0, 1))
    assert(s1.contains(BState(50, 1000L, 2)))
    // +30 more events, watermark still early → nothing flushes
    val (f2, s2) = Batcher.step("s3", s1, 30, 2000L, 100, 30000L, watermarkMs = 5000L)
    assert(f2.isEmpty && s2.contains(BState(80, 1000L, 2)))
    // watermark passes firstTs+flushMs → time flush of the remainder
    val (f3, s3) = Batcher.step("s3", s2, 5, 40000L, 100, 30000L, watermarkMs = 31000L)
    assert(f3 == Seq(Flush("s3", 2, 85, 1000L, "time")))
    assert(s3.contains(BState(0, 0, 3)))
    // exact multiple leaves an empty buffer, sequence preserved
    val (f4, s4) = Batcher.step("s3", s3, 200, 50000L, 100, 30000L, 0L)
    assert(f4.map(_.n_events).sum == 200 && s4.contains(BState(0, 0, 5)))
    // flush clock starts at the EARLIEST buffered event, even if a later
    // micro-batch delivers an earlier (late) event
    val (_, s5) = Batcher.step("s3", None, 10, 9000L, 100, 30000L, 0L)
    val (f6, _) = Batcher.step("s3", s5, 10, 3000L, 100, 30000L, 33001L)
    assert(f6 == Seq(Flush("s3", 0, 20, 3000L, "time")))
  }

  test("streaming: flushes respect batchSize; totals reconcile with routed counts") {
    val s = sc
    import s.implicits._
    val landing = Files.createTempDirectory("batcher-landing").toString
    // four appends into ONE landing dir (the file source does not recurse);
    // increasing mtimes + maxFilesPerTrigger=1 → one micro-batch per file,
    // so the watermark advances between them and time/timeout flushes fire
    Webtext.dataset(s, 600, 1).write.mode("append").parquet(landing)
    Thread.sleep(1100)
    Webtext.dataset(s, 600, 1) // same rows: doubles counts, same time span
      .map(d => d.copy(url = d.url + "?b"))
      .write.mode("append").parquet(landing)
    Thread.sleep(1100)
    // sentinel far in the future pushes the watermark past every deadline
    Webtext.dataset(s, 1, 1)
      .map(d => d.copy(url = d.url + "?s",
        warc_ts = new java.sql.Timestamp(d.warc_ts.getTime + 365L * 86400000L)))
      .write.mode("append").parquet(landing)
    Thread.sleep(1100)
    // second sentinel: the watermark lags one micro-batch, so one more
    // batch is needed for the first sentinel's advance to take effect
    Webtext.dataset(s, 1, 1)
      .map(d => d.copy(url = d.url + "?t",
        warc_ts = new java.sql.Timestamp(d.warc_ts.getTime + 730L * 86400000L)))
      .write.mode("append").parquet(landing)

    val stream = s.readStream.schema(pipeline.model.Schemas.webtext)
      .option("maxFilesPerTrigger", 1).parquet(landing)
    val routed = Pipeline.transform(stream)
    val out = Batcher.flushes(routed, batchSize = 100, flushMs = 60 * 60000L)
    // the map-side combine sits BELOW the stateful operator: the per-sink
    // group iteration sees partitions×sinks pre-aggregated rows, never the
    // full event stream through one task
    val lp = out.queryExecution.analyzed.toString
    assert(lp.contains("FlatMapGroupsWithState"), lp.take(2000))
    assert(lp.indexOf("MapPartitions") > lp.indexOf("FlatMapGroupsWithState"),
      s"pre-combine not below the stateful op:\n${lp.take(2000)}")
    val q = out.writeStream.format("memory").queryName("flushes")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("bck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val flushes = s.sql("SELECT * FROM flushes").as[Flush].collect()
    assert(flushes.nonEmpty)
    // no flush ever exceeds batchSize; count-triggered are exactly batchSize
    assert(flushes.forall(_.n_events <= 100))
    assert(flushes.filter(_.trigger == "count").forall(_.n_events == 100))
    // time/timeout flushes happened (the fixture spans 30 days at 1 row/min,
    // far beyond the 1h flush window)
    assert(flushes.exists(f => f.trigger == "time" || f.trigger == "timeout"))
    // per-sink sequence numbers are dense from 0 (exactly-once bookkeeping)
    flushes.groupBy(_.sink).foreach { case (_, fs) =>
      assert(fs.map(_.seq).sorted.toSeq == (0L until fs.length).toSeq)
    }
    // reconciliation: everything routed before the sentinels flushed (the
    // sentinels themselves may still sit in open buffers when the stream
    // ends — at-least-once state, drained on the next run)
    val expected = pipeline.ref.RefNormalizer
      .routedCounts((0L until 600L).iterator.map(Webtext.row))
      .map { case (k, v) => k -> v * 2 } // two identical files
    val flushed = flushes.groupBy(_.sink).view.mapValues(_.map(_.n_events).sum).toMap
    expected.foreach { case (sink, n) =>
      val got = flushed.getOrElse(sink, 0L)
      assert(got >= n && got <= n + 2, s"sink $sink: flushed $got, routed $n (+<=2 sentinels)")
    }
  }
}
