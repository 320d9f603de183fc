package graft.analytics

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal decode under the correctness gate. The test tables carry
  * no media columns, so the assets are GENERATED at plan-build time —
  * driver-side ImageIO-encoded PNGs with known pixels (lossless, so
  * decoded dimensions/channels/luma are exact constants) plus one junk
  * blob. The oracle states those constants: a codec, schema, or
  * fallback regression hash-fails.
  */
object MultimodalQueries {

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** PNG decode: exact dimensions/channels + Rec.601 luma of solid-
    * color images (white=1, black=0, pure red=0.299), junk flagged
    * undecoded.
    */
  val qMultimodalDecode: QueryDef = QueryDef.sql(
    "q_multimodal_decode",
    """SELECT * FROM (VALUES
      |  (1, 3, 2, 3, CAST(1.0 AS DOUBLE), true),
      |  (2, 5, 4, 3, CAST(0.0 AS DOUBLE), true),
      |  (3, 4, 4, 3, CAST(0.299 AS DOUBLE), true),
      |  (4, NULL, NULL, NULL, NULL, false))
      |  AS t(asset_id, width, height, channels, mean_luma, decoded)
      |ORDER BY asset_id""".stripMargin,
    doc = "JDK ImageIO decode of generated PNGs (multimodal ops)") { (s, dir) =>
    import s.implicits._
    val assets = Seq(
      (1L, "mem://white.png", png(3, 2, 0xFFFFFF)),
      (2L, "mem://black.png", png(5, 4, 0x000000)),
      (3L, "mem://red.png", png(4, 4, 0xFF0000)),
      (4L, "mem://junk.png", Array[Byte](9, 9, 9))
    ).toDF("id", "uri", "bytes")
    val feats = Multimodal.extractImageFeatures(
      Multimodal.toMediaAssets(assets, "id", "uri", "bytes")(s))(s)
    feats.select(col("asset_id"),
        when(col("decoded"), col("width")).as("width"),
        when(col("decoded"), col("height")).as("height"),
        when(col("decoded"), col("channels")).as("channels"),
        when(col("decoded"), round(col("mean_luma"), 6).cast("double"))
          .as("mean_luma"),
        col("decoded"))
      .orderBy("asset_id")
  }

  val all: Seq[QueryDef] = Seq(qMultimodalDecode)
}
