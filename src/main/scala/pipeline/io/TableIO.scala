package pipeline.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Thin table layer (SURVEY.md §7.1). In-sandbox implementation is
 * partitioned Parquet; on a real cluster the same trait is backed by
 * Iceberg (`df.writeTo(table).append()`, snapshot-based time travel) —
 * no Iceberg runtime jar exists offline, so that binding is documented
 * here and the Ledger supplies the ACID-ish resume Iceberg snapshots
 * would give.
 */
trait TableIO {
  def read(spark: SparkSession, table: String): DataFrame
  def write(df: DataFrame, table: String, partitionCols: Seq[String],
            maxRecordsPerFile: Long = 1000000L): Unit
}

/** Parquet-backed TableIO rooted at a directory. */
final class ParquetTableIO(root: String) extends TableIO {

  def path(table: String): String = s"$root/$table"

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))

  /**
   * Partitioned write. `maxRecordsPerFile` bounds rows per output file
   * regardless of partition skew. It is DELIBERATELY independent of the
   * reference's destination `batchSize` (a push-batch bound — events per
   * webhook POST; `examples/stdin_to_s3_config.json:14` says 100, and
   * 100-row parquet files would be a small-file catastrophe at scale).
   */
  override def write(df: DataFrame, table: String, partitionCols: Seq[String],
                     maxRecordsPerFile: Long = 1000000L): Unit = {
    val w = df.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path(table))
  }
}
