package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-plan timing of text_nb_classify (optimization round 22: the
  * solo row prices 3× its standing min with untouched operator code —
  * find the grown piece). `tools/run.sh graft.tools.NbProbe [sfDir]`
  */
object NbProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Functions.install(spark)
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 2) {
      println(s"rep $rep")
      val dd = spark.read.parquet(s"$dir/documents.parquet")
      t("raw scan count")(dd.count())
      val docs = dd.repartition(32, col("doc_id"))
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val trainToks = train.select(col("lang").as("_l"),
        explode(graft.operators.TextOps.words(col("text"))).as("_w"))
      t("trainToks count")(trainToks.count())
      val c2 = trainToks.groupBy(col("_l"), col("_w"))
        .agg(count(lit(1)).as("_c"))
      t("c2 count")(c2.count())
      t("full query noop")(
        graft.queries.Pipeline.queries("text_nb_classify")(spark, dir)
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
