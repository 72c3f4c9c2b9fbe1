package graft.tools
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val name = if (args.nonEmpty) args(0) else "sig_convolve_long"
    val df = graft.SparkEntry.queries(name)(spark, dir)
    if (args.length > 1 && args(1) == "explain") df.explain("formatted")
    else {
      println(s"ROWS ${df.count()}")
      df.show(10, truncate = false)
    }
  }
}
