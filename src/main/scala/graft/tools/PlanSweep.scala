package graft.tools
import org.apache.spark.sql.SparkSession
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- args) {
      println(s"===== $name =====")
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
      val smj = "SortMergeJoin".r.findAllIn(p).size
      val exch = "Exchange".r.findAllIn(p).size
      val wsc = "WholeStageCodegen".r.findAllIn(p).size
      println(s"$name: BHJ=$broadcasts SMJ=$smj Exchange=$exch WSCG=$wsc")
      p.linesIterator.filter(l => l.contains("Scan") && l.contains("ReadSchema")).take(3).foreach(l => println("  " + l.take(200)))
    }
    spark.stop()
  }
}
