package pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import pipeline.fixtures.Webtext

/** Plan-shape regression guards: the properties PLANS.md documents must
  * hold structurally, not just at the time someone last read an explain. */
class PlanGuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.local(4, 4, "plan-guard")
  private def sc = { spark.sparkContext.setLogLevel("ERROR"); spark }

  private def webtextOnDisk(n: Long): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("plan-guard").toString
    Webtext.df(sc, n, 4).write.mode("overwrite").parquet(dir)
    sc.read.parquet(dir)
  }

  test("fused pre-write plan: exactly one shuffle; html never scanned") {
    val webtext = webtextOnDisk(2000)
    val routed = Pipeline.fusedPlan(webtext, 4)
    // AQE wraps the physical plan, so count exchanges in the rendered tree
    val plan = routed.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n$plan")
    assert(broadcasts == 2, s"both dims must be broadcast:\n$plan")
    assert(!plan.contains("html"), s"html column must be pruned from the scan:\n$plan")
  }

  test("enrich joins are broadcast-hash, never sort-merge") {
    val webtext = webtextOnDisk(2000)
    val plan = Pipeline.transform(webtext).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("day filter on parse output reaches the parquet scan as warc_ts range") {
    val webtext = webtextOnDisk(2000)
    val df = stages.Parse(webtext)
      .filter(col("day") === lit(java.sql.Date.valueOf("2026-01-01")))
      .select("url", "status")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThanOrEqual(warc_ts"),
      s"day predicate not pushed as warc_ts range:\n$scan")
  }

  test("SQL surface: registered graft_* functions match the Column API") {
    val s = sc
    pipeline.expr.Functions.registerAll(s)
    val dir = java.nio.file.Files.createTempDirectory("sql-fn").toString
    Webtext.df(s, 300, 2).select("url", "text").write.mode("overwrite").parquet(dir)
    s.read.parquet(dir).createOrReplaceTempView("wt")
    val viaSql = s.sql(
      """SELECT graft_simhash(text) AS sh, graft_fingerprint(text) AS fp,
        |       graft_cosine(array(1.0F, 2.0F), array(2.0F, 4.0F)) AS cos,
        |       graft_parse_event(url, text).status AS st
        |FROM wt""".stripMargin)
    val viaCols = s.read.parquet(dir).select(
      pipeline.expr.PortableExprs.simhash(col("text"), 16).as("sh"),
      pipeline.expr.PortableExprs.fingerprint(col("text")).as("fp"),
      pipeline.expr.PortableExprs.cosine(
        array(lit(1.0f), lit(2.0f)), array(lit(2.0f), lit(4.0f))).as("cos"),
      pipeline.expr.PortableExprs.parseEvent(col("url"), col("text"))
        .getField("status").as("st"))
    assert(viaSql.exceptAll(viaCols).isEmpty && viaCols.exceptAll(viaSql).isEmpty)
    assert(math.abs(viaSql.head.getDouble(2) - 1.0) < 1e-12)
  }
}
