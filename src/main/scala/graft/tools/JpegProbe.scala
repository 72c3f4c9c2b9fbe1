package graft.tools

import org.apache.spark.sql.SparkSession

import graft.dsp.Image

/** Measurement harness: dHash stability under JPEG lossy re-encode,
  * per quality setting, on the REAL en-doc synthetic rasters — used
  * to pick (and re-audit) the mm_jpeg_pairs hamming threshold and
  * recovered-fraction gate floor.
  * `tools/run.sh graft.tools.JpegProbe [sfDir...]`
  */
object JpegProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (dir <- dirs) {
      val texts = spark.read.parquet(s"$dir/documents.parquet")
        .filter("lang = 'en' AND length(text) > 0")
        .select("text").as[String].collect()
      for (q <- Seq(75, 85, 90, 95, 100)) {
        val hams = texts.map { t =>
          val img = Image.synthGray(t, 16, 16, 0)
          val (bh, bl) = Image.dHash(Image.encodeBmp24(img))
          val (jh, jl) = Image.dHash(Image.encodeJpeg(img, q))
          java.lang.Long.bitCount(bh ^ jh) + java.lang.Long.bitCount(bl ^ jl)
        }.sorted
        val n = hams.length
        def pct(p: Double) = hams((p * (n - 1)).toInt)
        val fracLe = (t: Int) => hams.count(_ <= t).toDouble / n
        println(f"$dir%-24s q=$q%3d n=$n%5d ham p50=${pct(0.5)}%2d p90=${pct(0.9)}%2d p99=${pct(0.99)}%2d max=${hams.last}%2d frac<=3=${fracLe(3)}%.3f frac<=8=${fracLe(8)}%.3f frac<=16=${fracLe(16)}%.3f")
      }
    }
    spark.stop()
  }
}
