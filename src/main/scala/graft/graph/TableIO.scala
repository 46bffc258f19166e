package graft.graph

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage abstraction for stage tables (SURVEY §7.0): the pipeline's
  * checkpoint semantics (atomic commit, exists-check for resume, append
  * for observability rows) behind one trait. The sandbox ships no Iceberg
  * runtime jar, so the default is the parquet implementation with
  * equivalent commit semantics (`_SUCCESS` as the snapshot marker); on a
  * cluster an Iceberg implementation maps the same four operations to
  * `spark.table` / `writeTo(...).createOrReplace` / `append` with real
  * snapshot isolation, and nothing above this trait changes.
  */
trait TableIO {
  def exists(spark: SparkSession, table: String): Boolean
  def overwrite(df: DataFrame, table: String): Unit
  def append(df: DataFrame, table: String): Unit
  def read(spark: SparkSession, table: String): DataFrame
}

object ParquetTableIO extends TableIO {
  override def exists(spark: SparkSession, table: String): Boolean = {
    val p = new Path(table, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
  override def overwrite(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").parquet(table)
  override def append(df: DataFrame, table: String): Unit =
    df.write.mode("append").parquet(table)
  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(table)
}
