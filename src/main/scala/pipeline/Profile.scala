package pipeline

/** Dev scratch: phase timing for q_dedup_components (not part of the
  * library surface; deleted once the investigation lands). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val sc = spark.sparkContext
    var lastJobs = 0
    def jobs(name: String): Unit = {
      val n = sc.statusTracker.getJobIdsForGroup(null).length
      println(f"[profile] $name%-28s jobs=+${n - lastJobs}")
      lastJobs = n
    }
    // inline copy of Dedup.connectedComponents with iteration logging
    def ccLogged(pairs: org.apache.spark.sql.DataFrame, jumps: Int = 1): Unit = {
      import org.apache.spark.sql.functions._
      val edges = pairs.select(explode(array(
          struct(col("a").as("src"), col("b").as("dst")),
          struct(col("b").as("src"), col("a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .distinct().localCheckpoint()
      var labels = edges.select(col("src").as("node")).distinct()
        .withColumn("comp", col("node")).localCheckpoint()
      var frontier = labels
      var converged = false
      var iter = 0
      while (!converged && iter < 25) {
        val t0 = System.nanoTime()
        val viaNeighbors = edges
          .join(frontier.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node")).agg(min(col("comp")).as("ncomp"))
        val propagated = labels.join(viaNeighbors, Seq("node"), "left")
          .select(col("node"), col("comp").as("old"),
            least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        var jumped = propagated
        (1 to jumps).foreach { _ =>
          jumped = jumped
            .join(jumped.select(col("node").as("comp"), col("comp").as("comp2")),
              Seq("comp"), "left")
            .select(col("node"), col("old"),
              coalesce(col("comp2"), col("comp")).as("comp"))
        }
        val next = jumped
          .withColumn("chg", col("comp") =!= col("old"))
          .select("node", "comp", "chg").localCheckpoint()
        labels = next.select("node", "comp")
        frontier = next.filter(col("chg")).select("node", "comp")
        converged = frontier.isEmpty
        iter += 1
        println(f"[profile] cc iter $iter ${(System.nanoTime() - t0) / 1e9}%6.2fs converged=$converged")
      }
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val pairs = time("lsh pairs (count)") {
        val p = graft.Queries.qDedupEmbedLsh(spark, dir)
        p.count(); p
      }
      jobs("after pairs")
      val mat = time("pairs checkpoint") { pairs.localCheckpoint() }
      jobs("after ckpt")
      time("cc on materialized pairs") {
        pipeline.ops.Dedup.connectedComponents(mat).count()
      }
      jobs("after cc")
      time("cc logged") { ccLogged(mat) }
      jobs("after cc logged")
      time("cc logged 2 jumps") { ccLogged(mat, jumps = 2) }
      jobs("after cc 2j")
      time("cc logged 3 jumps") { ccLogged(mat, jumps = 3) }
      jobs("after cc 3j")
      time("full q_dedup_components") {
        graft.Queries.qDedupComponents(spark, dir).count()
      }
      jobs("after full")
    }
    spark.stop()
  }
}
