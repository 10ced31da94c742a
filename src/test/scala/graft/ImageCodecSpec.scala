package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The q114 REAL codec path: the payload is a genuine PNG, the decode is
  * a genuine ImageIO parse, and decoded features match the closed-form
  * pixel function — locally here, end-to-end in CORRECTNESS via the
  * DuckDB oracle. */
class ImageCodecSpec extends AnyFunSuite {
  import TestSession._

  /** Closed-form reference, independent of the codec round trip. */
  private def expected(id: Long): Multimodal.ImageFeatures = {
    val w = (4 + id % 5).toInt
    val h = (4 + id % 3).toInt
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      sr += (id * 31 + x * 7 + y * 13) % 256
      sg += (id * 17 + x * 5 + y * 11) % 256
      sb += (id * 23 + x * 3 + y * 19) % 256
    }
    Multimodal.ImageFeatures(id, w, h, sr, sg, sb)
  }

  test("augment: flip+crop weighted sums match closed form, and the flip is observable") {
    // independent reference over SOURCE coordinates; flip=false is the
    // unflipped crop — if the weighted sums never distinguished the two,
    // the weights would be failing at their one job
    def closedForm(id: Long, flip: Boolean): (Long, Long, Long) = {
      val w = (4 + id % 5).toInt
      val h = (4 + id % 3).toInt
      var wr = 0L; var wg = 0L; var wb = 0L
      for (ya <- 0 until h - 2; xa <- 0 until w - 2) {
        val sx = if (flip) w - 2 - xa else xa + 1
        val sy = ya + 1
        val wt = xa + 2 * ya + 1
        wr += wt * ((id * 31 + sx * 7 + sy * 13) % 256)
        wg += wt * ((id * 17 + sx * 5 + sy * 11) % 256)
        wb += wt * ((id * 23 + sx * 3 + sy * 19) % 256)
      }
      (wr, wg, wb)
    }
    var flipObserved = false
    (0L to 20L).foreach { id =>
      val got = Multimodal.augmentPngFeatures(id, Multimodal.encodePng(id))
      val want = closedForm(id, flip = true)
      assert((got.wsum_r, got.wsum_g, got.wsum_b) === want, s"doc $id")
      assert(got.width === (4 + id % 5).toInt - 2, s"doc $id width")
      assert(got.height === (4 + id % 3).toInt - 2, s"doc $id height")
      if (closedForm(id, flip = false) != want) flipObserved = true
    }
    assert(flipObserved, "weighted sums must distinguish flipped from unflipped")
  }

  test("encodePng emits real PNGs (magic bytes + ImageIO-parsable)") {
    val pngMagic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    Seq(0L, 1L, 7L, 123L, 9999L).foreach { id =>
      val bytes = Multimodal.encodePng(id)
      assert(bytes.take(8).sameElements(pngMagic), s"doc $id: not a PNG header")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img !== null)
      assert(img.getWidth === (4 + id % 5).toInt)
      assert(img.getHeight === (4 + id % 3).toInt)
    }
  }

  test("decode(encode(id)) recovers the closed-form features exactly (lossless)") {
    (0L to 40L).foreach { id =>
      val got = Multimodal.decodePngFeatures(id, Multimodal.encodePng(id))
      assert(got === expected(id), s"doc $id")
    }
  }

  test("decodePngFeatures rejects non-image payloads loudly") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodePngFeatures(5L, "not a png".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("not a decodable image"))
  }

  test("q114 corpus query: one feature row per document, all closed-form-exact") {
    val rows = SparkEntry.queries("q114_image_codec")(spark, sfDir).collect()
    val nDocs = Tables.t(spark, sfDir, "documents").count()
    assert(rows.length.toLong === nDocs)
    rows.foreach { r =>
      val exp = expected(r.getLong(0))
      assert((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)) ===
        ((exp.width, exp.height, exp.sum_r, exp.sum_g, exp.sum_b)), s"doc ${r.getLong(0)}")
    }
  }

  /** Closed-form reference for the q147 animated-GIF path: gray sum over
    * the SAMPLED (every 2nd) frames. */
  private def expectedGif(id: Long): Multimodal.VideoFeatures = {
    val w = (4 + id % 4).toInt
    val h = (3 + id % 3).toInt
    val nf = (2 + id % 4).toInt
    var sum = 0L
    var sampled = 0
    for (k <- 0 until nf if k % 2 == 0) {
      sampled += 1
      for (y <- 0 until h; x <- 0 until w)
        sum += (id * 29 + k * 41 + x * 7 + y * 13) % 256
    }
    Multimodal.VideoFeatures(id, nf, sampled, w, h, sum)
  }

  test("encodeGif emits real multi-frame GIFs (magic + frame count from the container)") {
    Seq(0L, 1L, 7L, 123L, 9999L).foreach { id =>
      val bytes = Multimodal.encodeGif(id)
      assert(new String(bytes.take(6), "US-ASCII") === "GIF89a", s"doc $id: not GIF89a")
      val got = Multimodal.decodeGifFrameSample(id, bytes)
      assert(got.n_frames === (2 + id % 4).toInt, s"doc $id frame count")
    }
  }

  test("GIF frame pixels round-trip the gray palette losslessly") {
    val id = 0L
    val bytes = Multimodal.encodeGif(id)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val img = reader.read(0)
      val bad = for {
        y <- 0 until img.getHeight
        x <- 0 until img.getWidth
        exp = ((7 * x + 13 * y) % 256)
        got = img.getRGB(x, y) & 0xff
        if got != exp
      } yield s"($x,$y): got $got want $exp"
      assert(bad.isEmpty, bad.take(10).mkString("; "))
    } finally { reader.dispose(); iis.close() }
  }

  test("decodeGifFrameSample(encodeGif(id)) recovers closed-form features exactly") {
    (0L to 40L).foreach { id =>
      val got = Multimodal.decodeGifFrameSample(id, Multimodal.encodeGif(id))
      assert(got === expectedGif(id), s"doc $id")
    }
  }

  test("dhashBrightPair bits match the g<251 / g<247 closed forms") {
    // green ramps by +5 per x step, so the gradient sign is positive
    // unless the step wraps (orig: g >= 251) or the +8 brightness clamp
    // flattens it (bright: g >= 247) — the q205 oracle's two CASEs
    (0L to 40L).foreach { id =>
      val w = (4 + id % 5).toInt; val h = (4 + id % 3).toInt
      var ho = 0L; var hb = 0L; var i = 0
      for (y <- 0 until h; x <- 0 until w - 1) {
        val g = (id * 17 + 5 * x + 11 * y) % 256
        if (g < 251) ho |= 1L << i
        if (g < 247) hb |= 1L << i
        i += 1
      }
      val got = Multimodal.dhashBrightPair(id, Multimodal.encodePng(id))
      assert(got === Multimodal.DHashPair(id, ho, hb, ho == hb), s"doc $id")
    }
  }

  test("decodeGifKeyframes diff sums match the 41-or-215 wraparound closed form") {
    // pixel(k) - pixel(k-1) is +41 mod 256: abs diff is 41 unless the
    // previous value wraps (>= 215), where it is 215 — the property the
    // q202 oracle encodes in SQL
    (0L to 40L).foreach { id =>
      val w = (4 + id % 4).toInt; val h = (3 + id % 3).toInt
      val nf = (2 + id % 4).toInt
      val expected = (1 until nf).map { f =>
        val diff = (for { y <- 0 until h; x <- 0 until w } yield {
          val prev = (id * 29 + (f - 1) * 41 + x * 7 + y * 13) % 256
          if (prev >= 215) 215L else 41L
        }).sum
        Multimodal.KeyframeRow(id, f, diff, diff >= 69L * w * h)
      }
      val got = Multimodal.decodeGifKeyframes(id, Multimodal.encodeGif(id))
      assert(got === expected, s"doc $id")
    }
  }
}
