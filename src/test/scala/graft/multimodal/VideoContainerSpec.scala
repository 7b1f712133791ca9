package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Container-level pins for the AVI writer/parser pair — no Spark session
  * needed; this is the codec layer below the operators. */
class VideoContainerSpec extends AnyFunSuite {

  test("DIB container matches the documented layout formula exactly") {
    for (id <- Seq(0L, 1L, 7L, 42L, 119L, 4999L)) {
      val container = Video.buildAviDib(id)
      assert(container.length.toLong === Video.dibContainerBytes(id),
        s"clip $id layout drifted from the formula the oracle uses")
    }
  }

  test("parser round-trips the writer: headers, frame count, frame payloads") {
    val id = 42L
    val p = Video.parseAvi(Video.buildAviDib(id))
    val (w, h, n, _) = Video.dims(id)
    assert(p.width === w && p.height === h && p.nFrames === n)
    assert(p.handler === "DIB " && p.biCompression === 0L)
    assert(p.frames.length === n)
    val stride = ((3 * w + 3) / 4) * 4
    p.frames.foreach { case (_, data) => assert(data.length === stride * h) }
  }

  test("parser rejects a corrupted RIFF size instead of decoding garbage") {
    val container = Video.buildAviDib(42L)
    val bad = container.clone()
    bad(4) = (bad(4) ^ 0x7f).toByte
    val err = intercept[IllegalArgumentException](Video.parseAvi(bad))
    assert(err.getMessage.contains("RIFF size mismatch"))
  }

  test("scene detect: cuts land exactly on scene-period boundaries with the closed-form SAD levels") {
    import graft.TestSpark.{spark, dir}
    val rows = Video.sceneDetect(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h, n, _) = Video.dims(id)
      val sp = Video.scenePeriod(id)
      val px = w * h
      assert(r.getAs[Int]("n_frames") === n)
      assert(r.getAs[Int]("scene_period") === sp)
      // cut boundaries: f in [1, n-1] with f % sp == 0 (scene index jumps)
      val cuts = (1 until n).filter(f => f / sp != (f - 1) / sp)
      assert(r.getAs[Long]("n_cuts") === cuts.length.toLong)
      assert(r.getAs[Int]("first_cut") === cuts.headOption.getOrElse(0))
      // circular SAD is EXACTLY 31·px in-scene and 222·px across a cut
      val expectedSad = (1 until n).map(f => if (f / sp != (f - 1) / sp) 222L * px else 31L * px).sum
      assert(r.getAs[Long]("sad_total") === expectedSad)
    }
  }

  test("MJPEG variant carries real decodable JPEGs with the clip's dimensions") {
    val id = 7L
    val p = Video.parseAvi(Video.buildAviMjpeg(id))
    val (w, h, n, _) = Video.dims(id)
    assert(p.handler === "MJPG" && p.nFrames === n)
    p.frames.foreach { case (_, jpeg) =>
      assert((jpeg(0) & 0xff) === 0xff && (jpeg(1) & 0xff) === 0xd8, "JPEG SOI magic")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      assert(img != null && img.getWidth === w && img.getHeight === h)
    }
  }
}
