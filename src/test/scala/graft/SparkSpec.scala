package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (Test / fork := true). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** Order-insensitive comparison (the reference's CFG-test style:
    * set semantics over emitted rows, test_cfg_parser.py:32-84). */
  def rowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(r => (0 until r.length).map(r.get)).toSet

  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val (sa, sb) = (rowSet(a), rowSet(b))
    val missing = sb -- sa
    val extra = sa -- sb
    assert(missing.isEmpty && extra.isEmpty,
      s"missing=${missing.take(5)} extra=${extra.take(5)}")
  }

  import java.sql.Timestamp
  def turns(rows: (String, Int, String)*): DataFrame = {
    // (conv_id, turn_idx, text) with synthetic role/tool/ts
    val data = rows.map { case (c, i, t) =>
      graft.schema.Turn(c, i, "user", t, "", new Timestamp(1700000000000L + i * 1000L))
    }
    spark.createDataFrame(data)
  }
}
