package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.operators.Multimodal

class SourcesSpec extends SparkTestBase {

  test("media source reads binary files with typed metadata and feeds Multimodal") {
    val dir = Files.createTempDirectory("graft_media")
    Files.write(dir.resolve("a.png"), Array[Byte](1, 2, 3, 0x11, 0x7f))
    Files.write(dir.resolve("b.wav"), Array.tabulate[Byte](32)(_.toByte))
    try {
      val media = Sources.media(spark, dir.toString).cache()
      val rows = media.collect().map(r =>
        (r.getString(0).split('/').last, r.getAs[Array[Byte]]("content").length,
          r.getStruct(2).getAs[String]("mime"))).toSet
      assert(rows == Set(("a.png", 5, "image/png"), ("b.wav", 32, "audio/wav")))

      val feats = Multimodal.imageFeatures(media)
        .filter(org.apache.spark.sql.functions.col("media_id").endsWith("a.png"))
        .select("features").collect()(0).getSeq[Long](0)
      assert(feats.sum == 5 && feats(0) == 3 && feats(1) == 1 && feats(7) == 1)

      val png = Sources.media(spark, dir.toString, Some("*.png")).count()
      assert(png == 1)
    } finally {
      dir.toFile.listFiles().foreach(_.delete())
      Files.deleteIfExists(dir)
    }
  }
}
