package graft.tools
import org.apache.spark.sql.SparkSession
/** Ad-hoc plan inspector: `tools/run.sh graft.tools.ExplainCheck <op>` —
  * prints the formatted physical plan for one Signal op so shuffle
  * count, pushdown, and codegen spans can be reviewed (SURVEY.md §6).
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Functions.install(spark)
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val out = graft.operators.Signal.rfft(ev, Seq("user_id"), "ts", "value")
    out.explain("formatted")
  }
}
