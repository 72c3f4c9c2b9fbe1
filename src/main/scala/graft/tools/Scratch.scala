package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select(col("ts"), (col("ts").cast("double") / lit(1e9)).as("t"))
      .withColumn("fp", floor(col("t") * lit(1e6) + lit(0.5)).cast("long"))
      .limit(5)
    ev.collect().foreach { r =>
      val ts = r.getLong(0); val t = r.getDouble(1); val fp = r.getLong(2)
      val pt = ts.toDouble / 1e9
      val pfp = math.floor(pt * 1e6 + 0.5).toLong
      println(s"$ts t=$t jvm_t=$pt fp=$fp jvm_fp=$pfp ${if (fp == pfp) "MATCH" else "DIFF"}")
    }
  }
}
