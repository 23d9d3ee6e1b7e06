package pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import pipeline.fixtures.Webtext

/** Scale-path mechanics (SURVEY.md §4.2): bucketed co-located joins (big-big
  * join with NO shuffle) and AQE skew-join splitting on the hot-domain
  * fixture. These run at test scale with thresholds tuned down — the
  * mechanism, not the volume, is what's under test. */
class ScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(4, 4, "scale-spec")
  private def sc = { spark.sparkContext.setLogLevel("ERROR"); spark }

  /** Set runtime confs, run, restore. */
  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val s = sc
    val saved = pairs.map { case (k, _) => k -> util.Try(s.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => s.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("bucketed tables join without any shuffle (co-located big-big join)") {
    val s = sc
    // managed-table locations survive JVM restarts while the in-memory
    // catalog does not — purge both before (re)creating
    Seq("routed_by_host", "host_stats").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(loc)
      }
    }
    val parsed = Pipeline.transform(Webtext.df(s, 4000, 4))
      .select("url", "host", "status", "sink")
    parsed.write.mode("overwrite")
      .bucketBy(8, "host").sortBy("host")
      .saveAsTable("routed_by_host")
    parsed.groupBy("host").agg(count(lit(1)).as("host_total"))
      .write.mode("overwrite")
      .bucketBy(8, "host").sortBy("host")
      .saveAsTable("host_stats")

    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = s.table("routed_by_host")
        .join(s.table("host_stats"), "host")
        .filter(col("host_total") > 0)
      val nRouted = s.table("routed_by_host").count()
      assert(joined.count() == nRouted, "1:1 enrich keeps multiplicity")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.toLowerCase.contains("bucket"),
        s"expected bucketed scan:\n$plan")
    }
  }

  test("AQE splits the skewed hot-domain join partition") {
    val s = sc
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // hot.example.com carries ~30% of rows on BOTH sides; both join
      // children must be plain shuffles (OptimizeSkewedJoin only matches
      // Sort <- ShuffleQueryStage, not reused aggregate exchanges)
      val facts = Pipeline.transform(Webtext.df(s, 3000, 8))
        .select("url", "host", "status")
      val hostEvents = Webtext.df(s, 3000, 8)
        .select(expr("parse_url(url, 'HOST')").as("host"), col("warc_ts"))
      val joined = facts.join(hostEvents, "host")
      // execute THIS QueryExecution (count() would build a separate one)
      val n = joined.queryExecution.toRdd.count()
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(n > 3000L, "fan-out join multiplicity")
      assert(finalPlan.contains("skew=true"),
        s"AQE skew-join did not trigger:\n$finalPlan")
    }
  }
}
