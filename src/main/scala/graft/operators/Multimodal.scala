package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (north-star extension, SURVEY §2B): treat
  * image/audio/video payloads as opaque BinaryType columns with typed
  * metadata, and run decode / feature-extract / resize / frame-sample as
  * per-partition batch transforms.
  *
  * Two decode tiers: q114 (images, `javax.imageio` PNG), q118 (audio,
  * `javax.sound.sampled` WAV), and q147 (multi-frame video-style clips,
  * animated GIF via ImageIO's multi-image reader/writer) are REAL codec
  * paths — JDK dependency-free encode + decode, features extracted from
  * decoded pixels/samples/frames, bit-exactly oracled through closed-form
  * generator functions; every media modality now has a real-codec row.
  * q83 keeps the clearly-marked byte-stats stand-in for codecs the JDK
  * lacks (mp4/h264-class formats); its binary column, metadata struct,
  * mapPartitions batch shape (Scala's analogue of mapInPandas batches),
  * and frame-sampling explode are the real Spark plumbing a production
  * pipeline keeps while swapping codecs in.
  *
  * Scale notes (100 TB of media): payload bytes never enter a shuffle —
  * every operator is a narrow per-partition map; only scalar features /
  * metadata flow into joins and aggregates. Partition sizing is by input
  * bytes (`spark.sql.files.maxPartitionBytes`), not rows, because row
  * width dominates.
  */
object Multimodal extends QueryModule {

  // ImageIO's convenience read/write otherwise spools through an on-disk
  // cache file per call — pure overhead (and tmp-dir churn) for the small
  // in-memory payloads media columns carry through an executor.
  javax.imageio.ImageIO.setUseCache(false)

  /** One decoded image: REAL features from ImageIO-decoded pixels (q114).
    * Integer channel sums (not float means) so the oracle comparison is
    * exact — same design as [[MediaFeatures]]. */
  final case class ImageFeatures(
      doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Deterministic doc_id-seeded RGB test image, PNG-encoded with the
    * JDK's real codec (javax.imageio — dependency-free). Pixel (x, y) of
    * doc d is the closed-form ((d*31+x*7+y*13) % 256, (d*17+x*5+y*11) %
    * 256, (d*23+x*3+y*19) % 256), dims (4 + d%5) × (4 + d%3) — a pixel
    * function simple enough to restate in oracle SQL, which is what makes
    * the decode path below bit-exactly checkable. */
  def encodePng(id: Long): Array[Byte] = {
    val w = (4 + (id % 5)).toInt
    val h = (4 + (id % 3)).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 5 + y * 11) % 256).toInt
        val b = ((id * 23 + x * 3 + y * 19) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL decode (the q83 stub's production counterpart): parse the PNG
    * payload with ImageIO and extract features from the decoded pixels —
    * dimensions plus per-channel sums. PNG is lossless, so for the seeded
    * fixtures these equal the closed-form pixel function exactly. */
  def decodePngFeatures(id: Long, payload: Array[Byte]): ImageFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"doc $id: payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    // one bulk grab instead of w*h per-pixel getRGB calls — per-pixel
    // access pays ColorModel dispatch per call, which dominates at real
    // image sizes (the fixtures are tiny, but this is the production form)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      sr += (rgb >> 16) & 0xff
      sg += (rgb >> 8) & 0xff
      sb += rgb & 0xff
      i += 1
    }
    ImageFeatures(id, w, h, sr, sg, sb)
  }

  /** One 2x2 image patch (q180): ViT-style patch-grid features. Integer
    * channel sums per patch keep the oracle exact (same design as
    * [[ImageFeatures]]). patch_id = py * (w/2) + px, row-major. */
  final case class PatchFeatures(
      doc_id: Long, patch_id: Int, px: Int, py: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** ViT-style PATCHIFY on the real codec path (q180): decode the PNG
    * payload and split the image into non-overlapping 2x2 patches (the
    * trailing odd row/column is dropped, as ViT crops to a multiple of
    * the patch size); per patch emit integer channel sums. One bulk
    * getRGB grab, then pure index arithmetic. */
  def patchifyPng(id: Long, payload: Array[Byte]): Seq[PatchFeatures] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"doc $id: payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val pw = w / 2
    val ph = h / 2
    val pix = img.getRGB(0, 0, w, h, null, 0, w)
    for (py <- 0 until ph; px <- 0 until pw) yield {
      var sr = 0L; var sg = 0L; var sb = 0L
      var dy = 0
      while (dy < 2) {
        var dx = 0
        while (dx < 2) {
          val rgb = pix((2 * py + dy) * w + (2 * px + dx))
          sr += (rgb >> 16) & 0xff
          sg += (rgb >> 8) & 0xff
          sb += rgb & 0xff
          dx += 1
        }
        dy += 1
      }
      PatchFeatures(id, py * pw + px, px, py, sr, sg, sb)
    }
  }

  /** One augmented image (q169): horizontal flip + 1-pixel center crop,
    * features from the AUGMENTED pixels. The sums are POSITION-WEIGHTED
    * (wt = xa + 2*ya + 1 over augmented coords) — a plain channel sum is
    * flip-invariant and would vacuously pass an unflipped implementation;
    * the weighted sum pins the geometry. Integer weights × integer
    * channels keep the oracle exact. */
  final case class AugmentedFeatures(
      doc_id: Long, width: Int, height: Int,
      wsum_r: Long, wsum_g: Long, wsum_b: Long)

  /** REAL augmentation path (q169): decode the PNG payload, flip
    * horizontally, crop the 1-pixel border (the train-time 'random' crop
    * made deterministic), then extract position-weighted channel sums
    * from the augmented pixels. Augmented (xa, ya) reads source
    * (w-1-(xa+1), ya+1); fixture dims are >= 4x4 so the crop is never
    * empty. */
  def augmentPngFeatures(id: Long, payload: Array[Byte]): AugmentedFeatures = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, s"doc $id: payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    require(w >= 4 && h >= 4, s"doc $id: ${w}x$h too small for the 1-px crop")
    val aw = w - 2
    val ah = h - 2
    val aug = new java.awt.image.BufferedImage(
      aw, ah, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var ya = 0
    while (ya < ah) {
      var xa = 0
      while (xa < aw) {
        aug.setRGB(xa, ya, img.getRGB(w - 1 - (xa + 1), ya + 1))
        xa += 1
      }
      ya += 1
    }
    val px = aug.getRGB(0, 0, aw, ah, null, 0, aw)
    var wr = 0L; var wg = 0L; var wb = 0L
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      val wt = (i % aw + 2 * (i / aw) + 1).toLong
      wr += wt * ((rgb >> 16) & 0xff)
      wg += wt * ((rgb >> 8) & 0xff)
      wb += wt * (rgb & 0xff)
      i += 1
    }
    AugmentedFeatures(id, aw, ah, wr, wg, wb)
  }

  /** One decoded audio clip: REAL features from AudioSystem-decoded PCM
    * samples (q118). Integer amplitude sums (not float RMS) so the oracle
    * comparison is exact — same design as [[ImageFeatures]]. */
  final case class AudioFeatures(
      doc_id: Long, n_samples: Int, sample_rate: Int,
      sum_amp: Long, sum_abs: Long, max_abs: Int)

  /** Deterministic doc_id-seeded PCM clip, WAV-encoded with the JDK's
    * real audio codec (javax.sound.sampled — dependency-free, the audio
    * analogue of q114's ImageIO). Sample i of doc d is the closed form
    * ((d*37 + i*13) % 4001) - 2000 (16-bit signed range), length
    * 64 + d%33 samples at 8 kHz mono — restatable in oracle SQL, which
    * is what makes the decode path bit-exactly checkable. */
  def encodeWav(id: Long): Array[Byte] = {
    val n = (64 + (id % 33)).toInt
    val pcm = new Array[Byte](n * 2) // 16-bit signed little-endian mono
    var i = 0
    while (i < n) {
      val amp = (((id * 37 + i * 13) % 4001) - 2000).toInt
      pcm(i * 2) = (amp & 0xff).toByte
      pcm(i * 2 + 1) = ((amp >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      8000f, 16, 1, /* signed = */ true, /* bigEndian = */ false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray // a genuine RIFF/WAVE payload, header and all
  }

  /** REAL audio decode: parse the WAV payload with AudioSystem (header,
    * format, frame count all come from the codec, not the generator) and
    * extract features from the decoded samples. WAV PCM is lossless, so
    * for the seeded fixtures these equal the closed-form amplitude
    * function exactly. */
  def decodeWavFeatures(id: Long, payload: Array[Byte]): AudioFeatures = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          && fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
          && !fmt.isBigEndian,
        s"doc $id: expected 16-bit signed LE mono PCM, got $fmt")
      val pcm = ais.readAllBytes()
      val n = pcm.length / 2
      var sum = 0L; var sumAbs = 0L; var maxAbs = 0
      var i = 0
      while (i < n) {
        val amp = (((pcm(i * 2 + 1) & 0xff) << 8) | (pcm(i * 2) & 0xff)).toShort.toInt
        sum += amp
        val a = math.abs(amp)
        sumAbs += a
        if (a > maxAbs) maxAbs = a
        i += 1
      }
      AudioFeatures(id, n, fmt.getSampleRate.toInt, sum, sumAbs, maxAbs)
    } finally ais.close()
  }

  /** q275's exact spectral row: DFT energies at the three bins whose
    * 64-point twiddle factors are EXACTLY {0, +/-1} — DC (k=0), quarter
    * band (k=16, coefficients cycle 1,-i,-1,i), Nyquist (k=32,
    * alternating +/-1) — so the whole spectral feature is integer
    * arithmetic on decoded samples: no cos(), no cross-engine libm ULP
    * surface (the q127/q238 rule applied to signal processing). */
  final case class SpectralFeatures(
      doc_id: Long, e_dc: Long, e_quarter: Long, e_nyquist: Long,
      sum_sq64: Long)

  /** Decode the WAV payload (real codec, q118's path) and compute the
    * three exactly-representable 64-point DFT bin energies over the
    * first 64 samples (every fixture clip has >= 64). */
  def spectralWavFeatures(id: Long, payload: Array[Byte]): SpectralFeatures = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val pcm = ais.readAllBytes()
      require(pcm.length / 2 >= 64, s"doc $id: clip shorter than 64 samples")
      var sum = 0L; var alt = 0L; var re = 0L; var im = 0L; var sq = 0L
      var i = 0
      while (i < 64) {
        val amp = (((pcm(i * 2 + 1) & 0xff) << 8) | (pcm(i * 2) & 0xff))
          .toShort.toInt
        sum += amp
        alt += (if (i % 2 == 0) amp else -amp)
        (i % 4: @annotation.switch) match {
          case 0 => re += amp
          case 1 => im -= amp
          case 2 => re -= amp
          case 3 => im += amp
        }
        sq += amp.toLong * amp
        i += 1
      }
      SpectralFeatures(id, sum * sum, re * re + im * im, alt * alt, sq)
    } finally ais.close()
  }

  /** One 32-sample audio frame (q190): ASR-style frame features. Integer
    * amplitude sums per frame keep the oracle exact — the audio analogue
    * of [[PatchFeatures]]. */
  final case class FrameFeatures(
      doc_id: Long, frame_id: Int,
      sum_amp: Long, sum_abs: Long, max_abs: Int)

  /** ASR-style FRAMING on the real codec path (q190): decode the WAV
    * payload and split the clip into non-overlapping 32-sample frames
    * (the trailing partial frame is dropped, as fixed-frame front ends
    * do); per frame emit integer amplitude sums + peak. The audio
    * analogue of [[patchifyPng]] — one decoded sample pass, pure index
    * arithmetic. */
  def frameWavFeatures(id: Long, payload: Array[Byte]): Seq[FrameFeatures] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          && fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
          && !fmt.isBigEndian,
        s"doc $id: expected 16-bit signed LE mono PCM, got $fmt")
      val pcm = ais.readAllBytes()
      val nFrames = pcm.length / 2 / 32
      for (f <- 0 until nFrames) yield {
        var sum = 0L; var sumAbs = 0L; var maxAbs = 0
        var i = f * 32
        while (i < (f + 1) * 32) {
          val amp = (((pcm(i * 2 + 1) & 0xff) << 8) | (pcm(i * 2) & 0xff))
            .toShort.toInt
          sum += amp
          val a = math.abs(amp)
          sumAbs += a
          if (a > maxAbs) maxAbs = a
          i += 1
        }
        FrameFeatures(id, f, sum, sumAbs, maxAbs)
      }
    } finally ais.close()
  }

  /** One augmented audio clip (q172): integer 2x gain clamped to ±3500
    * plus an 8-sample head/tail trim, features from the AUGMENTED
    * samples. Gain is pure multiplication (integer division semantics
    * for negatives differ between engines — truncation vs floor — so the
    * kernel avoids division entirely); the clamp bound sits inside the
    * doubled ±4000 amplitude range so clipping genuinely occurs and is
    * COUNTED, pinning the clamp to the oracle. */
  final case class AugmentedAudio(
      doc_id: Long, n_samples: Int,
      sum_amp: Long, sum_abs: Long, n_clipped: Long)

  /** REAL audio augmentation path (q172): decode the WAV payload, trim 8
    * samples from head and tail (the deterministic stand-in for random
    * cropping), apply 2x gain with hard clipping at ±3500, extract
    * integer sums + the clipped-sample count from the result. */
  def augmentWavFeatures(id: Long, payload: Array[Byte]): AugmentedAudio = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          && fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
          && !fmt.isBigEndian,
        s"doc $id: expected 16-bit signed LE mono PCM, got $fmt")
      val pcm = ais.readAllBytes()
      val n = pcm.length / 2
      require(n > 16, s"doc $id: $n samples too short for the 8+8 trim")
      var sum = 0L; var sumAbs = 0L; var clipped = 0L
      var i = 8
      while (i < n - 8) {
        val amp = (((pcm(i * 2 + 1) & 0xff) << 8) | (pcm(i * 2) & 0xff)).toShort.toInt
        val g0 = 2 * amp
        val ga = math.max(-3500, math.min(3500, g0))
        if (g0 > 3500 || g0 < -3500) clipped += 1
        sum += ga
        sumAbs += math.abs(ga)
        i += 1
      }
      AugmentedAudio(id, n - 16, sum, sumAbs, clipped)
    } finally ais.close()
  }

  /** One decoded multi-frame clip: REAL features from ImageIO-decoded GIF
    * frames (q147). Integer gray sums over the SAMPLED frames only, so
    * the oracle restates both the codec round-trip and the sampling
    * policy. */
  final case class VideoFeatures(
      doc_id: Long, n_frames: Int, n_sampled: Int,
      width: Int, height: Int, sampled_sum: Long)

  /** Deterministic doc_id-seeded multi-frame clip, encoded as an ANIMATED
    * GIF with the JDK's real multi-image codec (`ImageWriter
    * .writeToSequence` — dependency-free, the moving-picture analogue of
    * q114's PNG). Frame k's pixel (x, y) of doc d is the closed-form gray
    * (d*29 + k*41 + x*7 + y*13) % 256, dims (4 + d%4) × (3 + d%3),
    * 2 + d%4 frames. Grayscale keeps the round-trip lossless — but ONLY
    * through an explicit 256-gray IndexColorModel: the GIF writer copies
    * an indexed image's own palette verbatim, whereas a TYPE_BYTE_GRAY
    * source goes through the writer's default palette and quantizes
    * (measured: sums off on ~2/3 of docs). Pixels are written via the
    * raster (setSample = palette index = gray value), not setRGB, which
    * would apply a luminance conversion. */
  private val grayPalette: java.awt.image.IndexColorModel = {
    val v = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, v, v, v)
  }

  // Writer/reader SERVICE PROVIDERS cached once per executor JVM:
  // getImageWritersByFormatName walks the plugin registry per call, which
  // is per-row overhead inside mapPartitions. Instances themselves are
  // NOT thread-safe and stay per-call; only the SPI lookup is hoisted.
  private lazy val gifWriterSpi = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try w.getOriginatingProvider finally w.dispose()
  }
  private lazy val gifReaderSpi = {
    val r = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    try r.getOriginatingProvider finally r.dispose()
  }

  def encodeGif(id: Long): Array[Byte] = {
    val w = (4 + (id % 4)).toInt
    val h = (3 + (id % 3)).toInt
    val nf = (2 + (id % 4)).toInt
    val out = new java.io.ByteArrayOutputStream()
    val writer = gifWriterSpi.createWriterInstance()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      // interlaced (progressive) row order is the writer default; some
      // readers (including tiny-height edge cases here) then hand back
      // rows in pass order — plain sequential rows are what we mean
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      var k = 0
      while (k < nf) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, ((id * 29 + k * 41 + x * 7 + y * 13) % 256).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
        k += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray // a genuine GIF89a multi-frame payload
  }

  /** REAL video-style decode + FRAME SAMPLING: parse the animated-GIF
    * payload with ImageIO's multi-image reader (frame count and dims come
    * from the parsed container, not the generator), decode EVERY 2nd
    * frame, and extract gray sums from the decoded pixels. Decoded GIF
    * frames are palette-indexed; values are read through getRGB (palette
    * lookup), where a gray palette returns r = g = b = v. */
  def decodeGifFrameSample(id: Long, payload: Array[Byte]): VideoFeatures = {
    val reader = gifReaderSpi.createReaderInstance()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val nf = reader.getNumImages(/* allowSearch = */ true)
      require(nf > 0, s"doc $id: payload is not a decodable multi-frame GIF")
      var sum = 0L
      var sampled = 0
      var w = 0; var h = 0
      var k = 0
      while (k < nf) {
        if (k % 2 == 0) {
          val img = reader.read(k)
          w = img.getWidth; h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var i = 0
          while (i < px.length) { sum += px(i) & 0xff; i += 1 }
          sampled += 1
        }
        k += 1
      }
      VideoFeatures(id, nf, sampled, w, h, sum)
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** One inter-frame difference row from a decoded multi-frame payload:
    * frame_idx >= 1, diff_sum = sum over pixels of |frame - previous
    * frame| (decoded gray values), is_key = shot-change verdict at the
    * mean-diff threshold. */
  final case class KeyframeRow(
      doc_id: Long, frame_idx: Int, diff_sum: Long, is_key: Boolean)

  /** REAL shot detection: decode EVERY frame of the animated-GIF payload
    * and compute per-frame sum-of-absolute-differences against the
    * previous decoded frame — the content-based keyframe/shot-boundary
    * signal a video curation pipeline thresholds (here at 69 = the
    * closed-form mean abs diff of the generator: 41 w.p. 215/256 + 215
    * w.p. 41/256). Frames decode once each, consecutive pairs diff in a
    * rolling buffer — O(w·h) live pixels regardless of frame count. */
  def decodeGifKeyframes(id: Long, payload: Array[Byte]): Seq[KeyframeRow] = {
    val reader = gifReaderSpi.createReaderInstance()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val nf = reader.getNumImages(/* allowSearch = */ true)
      require(nf > 0, s"doc $id: payload is not a decodable multi-frame GIF")
      val out = scala.collection.mutable.ArrayBuffer[KeyframeRow]()
      var prev: Array[Int] = null
      var k = 0
      while (k < nf) {
        val img = reader.read(k)
        val w = img.getWidth; val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xff)
        if (prev != null) {
          var diff = 0L
          var i = 0
          while (i < px.length) { diff += math.abs(px(i) - prev(i)); i += 1 }
          out += KeyframeRow(id, k, diff, diff >= 69L * w * h)
        }
        prev = px
        k += 1
      }
      out.toSeq
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** One perceptual-hash row: the row-difference (dHash) fingerprints of
    * a decoded image and of its brightness-augmented (+8, clamped at
    * 255) variant, plus whether the augment preserved the hash. */
  final case class DHashPair(
      doc_id: Long, dhash_orig: Long, dhash_bright: Long, matched: Boolean)

  /** REAL perceptual hashing: decode the PNG, then compute the classic
    * dHash — bit i is 1 when the green value increases from pixel x to
    * x+1 (i = y*(w-1) + x, row-major over the w-1 comparisons per row;
    * the fixture images are already thumbnail-sized, so the production
    * resize-to-9x8 step is the identity here). The brightness variant
    * shifts every decoded value by +8 clamped at 255 BEFORE hashing —
    * gradient signs survive a uniform shift except where the clamp
    * flattens them, which is exactly the robustness/sensitivity
    * trade-off perceptual hashes are chosen for. */
  def dhashBrightPair(id: Long, payload: Array[Byte]): DHashPair = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, s"doc $id: payload is not a decodable image")
    val w = img.getWidth; val h = img.getHeight
    // bulk grab, not per-pixel getRGB — the same one-ColorModel-dispatch
    // form every decoder in this file uses (see decodePngFeatures)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var ho = 0L; var hb = 0L
    var i = 0; var y = 0
    while (y < h) {
      var x = 0
      while (x < w - 1) {
        val g1 = (px(y * w + x) >> 8) & 0xff
        val g2 = (px(y * w + x + 1) >> 8) & 0xff
        if (g2 > g1) ho |= 1L << i
        if (math.min(g2 + 8, 255) > math.min(g1 + 8, 255)) hb |= 1L << i
        i += 1
        x += 1
      }
      y += 1
    }
    DHashPair(id, ho, hb, ho == hb)
  }

  /** Exact integer distortion of the +8-clamp brightness augment on the
    * REAL decode path: per doc, the sum of squared per-channel pixel
    * diffs between the decoded PNG and its augmented form. Integer by
    * construction — each channel diff is min(c+8,255)-c, i.e. 8 below
    * the clamp knee and 255-c at it — so the measurement (PSNR's core
    * term, without the float log) oracles bit-exactly against the
    * generator's closed-form ramp. */
  final case class AugMse(doc_id: Long, n_px: Long, sse: Long)
  def augmentSse(id: Long, payload: Array[Byte]): AugMse = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, s"doc $id: payload is not a decodable image")
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var sse = 0L
    var i = 0
    while (i < px.length) {
      val p = px(i)
      var sh = 0
      while (sh <= 16) {
        val c = (p >> sh) & 0xff
        val d = math.min(c + 8, 255) - c
        sse += d.toLong * d
        sh += 8
      }
      i += 1
    }
    AugMse(id, w.toLong * h, sse)
  }

  /** One decoded media item: deterministic fake features from the bytes.
    * Carries the integer byte SUM (not a float mean) so downstream math
    * stays exact — the mean is derived in the query with the same
    * IEEE-deterministic floor-truncation the oracle uses. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, sum_bytes: Long, max_byte: Int,
      hist4: Seq[Long])

  /** STUB DECODE (would be a codec call in production): byte statistics
    * as a stand-in feature vector. Deterministic in the payload. */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaFeatures = {
    val hist = new Array[Long](4)
    var sum = 0L
    var max = 0
    payload.foreach { b =>
      val u = b & 0xff
      sum += u
      if (u > max) max = u
      hist(u >> 6) += 1
    }
    MediaFeatures(docId, payload.length, sum, max, hist.toSeq)
  }

  override def queries: Seq[Q] = Seq(
    Q(
      "q82_multimodal_metadata",
      "Binary media columns + typed metadata: payload as BinaryType " +
        "(UTF-8 bytes of text stand in for image bytes), metadata struct " +
        "(format/width/height) derived deterministically, frame count " +
        "from payload size. Fully codegen'd projection — the metadata " +
        "path never touches the payload bytes after octet_length.",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          .select(
            $"doc_id",
            $"text".cast("binary").as("payload"),
            $"n_chars")
          .select(
            $"doc_id",
            length($"payload").as("n_bytes"),
            element_at(typedLit(Seq("jpeg", "png", "wav", "mp4")),
              (($"doc_id" % 4) + 1).cast("int")).as("format"),
            (($"doc_id" % 8) * 160 + 320).cast("int").as("width"),
            (($"doc_id" % 8) * 90 + 180).cast("int").as("height"),
            floor(length($"payload") / 16.0).cast("int").as("n_frames"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INTEGER)      AS n_bytes,
               (['jpeg', 'png', 'wav', 'mp4'])[(doc_id % 4) + 1] AS format,
               CAST((doc_id % 8) * 160 + 320 AS INTEGER)         AS width,
               CAST((doc_id % 8) * 90 + 180 AS INTEGER)          AS height,
               CAST(floor(octet_length(encode(text)) / 16.0) AS INTEGER) AS n_frames
        FROM documents
        ORDER BY doc_id""")),

    Q(
      "q83_multimodal_decode",
      "Per-partition batch decode (mapPartitions — the Scala shape of " +
        "mapInPandas): binary payload → fake feature vector (STUB codec: " +
        "byte stats, standing in for codecs the JDK lacks — mp4/h264-class " +
        "formats, now that q114 covers images, q118 audio, and q147 " +
        "multi-frame clips with real JDK codecs; swap point is " +
        "Multimodal.fakeDecode). Narrow " +
        "transform, payloads never shuffled; only features aggregate. " +
        "The 4-bucket byte histogram flattens to scalar columns h0..h3 so " +
        "any harness can sort/hash the result; mean_byte is " +
        "floor-truncated to 4 dp (IEEE-deterministic on both engines). " +
        "Oracle recomputes the byte stats from codepoints — exact because " +
        "the fixture text is pure ASCII (byte == codepoint).",
      (s, dir) => {
        import s.implicits._
        val media = Tables.t(s, dir, "documents")
          .select($"doc_id", $"text".cast("binary").as("payload"))
          // empty payloads carry no signal and would make the mean 0/0;
          // excluded on both sides (the oracle filters text <> '' — its
          // char splitter would otherwise emit a bogus ord('')=-1 row)
          .filter(length($"payload") > 0)
          .as[(Long, Array[Byte])]
        media.mapPartitions { batch =>
          // batch-shaped: one iterator per partition, like an Arrow batch
          batch.map { case (id, payload) => fakeDecode(id, payload) }
        }.toDF()
          .select($"doc_id", $"n_bytes",
            (floor($"sum_bytes" * 10000.0 / $"n_bytes") / 10000.0).as("mean_byte"),
            $"max_byte",
            element_at($"hist4", 1).as("h0"), element_at($"hist4", 2).as("h1"),
            element_at($"hist4", 3).as("h2"), element_at($"hist4", 4).as("h3"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH b AS (
          SELECT doc_id, unnest([ord(c) for c in string_split(text, '')]) AS byte
          FROM documents
          WHERE text <> '')
        SELECT doc_id,
               CAST(count(*) AS INTEGER)                      AS n_bytes,
               floor(sum(byte) * 10000.0 / count(*)) / 10000.0 AS mean_byte,
               CAST(max(byte) AS INTEGER)                     AS max_byte,
               count(*) FILTER (byte < 64)                    AS h0,
               count(*) FILTER (byte >= 64 AND byte < 128)    AS h1,
               count(*) FILTER (byte >= 128 AND byte < 192)   AS h2,
               count(*) FILTER (byte >= 192)                  AS h3
        FROM b
        GROUP BY doc_id
        ORDER BY doc_id""")),

    Q(
      "q95_multimodal_resize",
      "Resize stub: nearest-neighbor downsample of the payload byte " +
        "signal onto a fixed 16-sample grid (the 1-D shape of image " +
        "resize — swap the sampler for a real interpolator with codecs). " +
        "Pure codegen'd projection + generator, no shuffle of payload " +
        "bytes; oracle resamples codepoints (fixtures are ASCII, byte == " +
        "codepoint, same equivalence as q83's oracle).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          .select($"doc_id", $"text".cast("binary").as("payload"))
          // same guard as q83: an empty payload has no bytes to resample —
          // Spark's ascii('') = 0 would fabricate 16 zero samples while the
          // oracle's ord on a missing char diverges
          .filter(length($"payload") > 0)
          .select($"doc_id",
            posexplode(expr(
              """transform(sequence(0, 15), i ->
                 ascii(substring(cast(payload as string),
                   int(floor(i * length(payload) / 16.0)) + 1, 1)))"""))
              .as(Seq("grid_idx", "sample_byte")))
          .orderBy($"doc_id", $"grid_idx")
      },
      Some("""
        WITH g AS (SELECT doc_id, text, unnest(range(0, 16)) AS grid_idx
                   FROM documents
                   WHERE text <> '')
        SELECT doc_id, CAST(grid_idx AS INTEGER) AS grid_idx,
               ord(text[CAST(floor(grid_idx * length(text) / 16.0) AS INTEGER) + 1])
                 AS sample_byte
        FROM g
        ORDER BY doc_id, grid_idx""")),

    Q(
      "q114_image_codec",
      "REAL media codec path (no stub): doc_id-seeded deterministic RGB " +
        "images are PNG-encoded with the JDK's javax.imageio codec in one " +
        "narrow mapPartitions (a genuine image/png BinaryType payload " +
        "column — magic bytes and all), then PNG-decoded back with " +
        "ImageIO.read in a second, and features extracted from the " +
        "DECODED pixels: dimensions + per-channel sums. PNG is lossless, " +
        "so the decoded features equal the closed-form pixel function " +
        "and the query is fully SQL-oracle-able — closing the one " +
        "'simulated vs implemented' gap the q83 byte-stats stub left. " +
        "Scale shape is identical to q83: payload bytes are born and die " +
        "inside one partition (never shuffled); only scalar features " +
        "leave the map.",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        // encode stage: the payload column a production pipeline would
        // read from object storage; here derived so the content is known
        val media = ids.mapPartitions(_.map(id => (id, encodePng(id))))
          .toDF("doc_id", "payload")
        // decode stage: the real codec call the q83 stub stands in for
        media.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, png) => decodePngFeatures(id, png) })
          .toDF()
          .orderBy($"doc_id")
      },
      Some("""
        WITH dims AS (
          SELECT doc_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
          FROM documents),
        px AS (
          SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM dims),
        c AS (
          SELECT doc_id, w, h, p % w AS x, p // w AS y FROM px)
        SELECT doc_id,
               CAST(any_value(w) AS INTEGER) AS width,
               CAST(any_value(h) AS INTEGER) AS height,
               CAST(sum((doc_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
               CAST(sum((doc_id * 17 + x * 5 + y * 11) % 256) AS BIGINT) AS sum_g,
               CAST(sum((doc_id * 23 + x * 3 + y * 19) % 256) AS BIGINT) AS sum_b
        FROM c GROUP BY doc_id ORDER BY doc_id""")),

    Q(
      "q169_image_augment",
      "TRAIN-TIME IMAGE AUGMENTATION on the real codec path: decode the " +
        "PNG payload (q114's ImageIO tier), HORIZONTAL FLIP + 1-pixel " +
        "center crop (the deterministic stand-in for random crop), then " +
        "position-weighted integer channel sums from the AUGMENTED " +
        "pixels — weighted because a plain sum is flip-invariant and " +
        "would pass an unflipped implementation vacuously; the weight " +
        "xa + 2*ya + 1 pins the output geometry to the oracle's " +
        "coordinate remap (augmented (xa, ya) reads source " +
        "(w-2-xa, ya+1)). Same 100 TB shape as every codec query: " +
        "payloads are born, augmented, and die inside one partition; " +
        "only scalar features leave the map.",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        val media = ids.mapPartitions(_.map(id => (id, encodePng(id))))
          .toDF("doc_id", "payload")
        media.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, png) => augmentPngFeatures(id, png) })
          .toDF()
          .orderBy($"doc_id")
      },
      Some("""
        WITH dims AS (
          SELECT doc_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
          FROM documents),
        px AS (
          SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM dims),
        c AS (
          SELECT doc_id, w, h, p % w AS x, p // w AS y FROM px),
        k AS (
          SELECT doc_id, w, h, x, y,
                 (w - 2 - x) + 2 * (y - 1) + 1 AS wt
          FROM c WHERE x >= 1 AND x <= w - 2 AND y >= 1 AND y <= h - 2)
        SELECT doc_id,
               CAST(any_value(w - 2) AS INTEGER) AS width,
               CAST(any_value(h - 2) AS INTEGER) AS height,
               CAST(sum(wt * ((doc_id * 31 + x * 7 + y * 13) % 256)) AS BIGINT) AS wsum_r,
               CAST(sum(wt * ((doc_id * 17 + x * 5 + y * 11) % 256)) AS BIGINT) AS wsum_g,
               CAST(sum(wt * ((doc_id * 23 + x * 3 + y * 19) % 256)) AS BIGINT) AS wsum_b
        FROM k GROUP BY doc_id ORDER BY doc_id""")),

    Q(
      "q118_audio_codec",
      "REAL audio codec path (no stub — the q114 pattern applied to " +
        "sound): doc_id-seeded deterministic PCM clips are WAV-encoded " +
        "with the JDK's javax.sound.sampled codec in one narrow " +
        "mapPartitions (a genuine RIFF/WAVE BinaryType payload column), " +
        "then decoded back with AudioSystem.getAudioInputStream in a " +
        "second — format, endianness, and frame count come from the " +
        "parsed header, not the generator — and features extracted from " +
        "the DECODED samples: count, sample rate, amplitude sums. WAV " +
        "PCM is lossless, so the decoded features equal the closed-form " +
        "amplitude function and the query is fully SQL-oracle-able. " +
        "Scale shape is identical to q114: payload bytes are born and " +
        "die inside one partition; only scalar features leave the map.",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        val media = ids.mapPartitions(_.map(id => (id, encodeWav(id))))
          .toDF("doc_id", "payload")
        media.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, wav) => decodeWavFeatures(id, wav) })
          .toDF()
          .orderBy($"doc_id")
      },
      Some("""
        WITH par AS (
          SELECT doc_id, 64 + doc_id % 33 AS n FROM documents),
        s AS (
          SELECT doc_id, n, unnest(range(0, n)) AS i FROM par),
        a AS (
          SELECT doc_id, n, ((doc_id * 37 + i * 13) % 4001) - 2000 AS amp FROM s)
        SELECT doc_id,
               CAST(any_value(n) AS INTEGER)       AS n_samples,
               CAST(8000 AS INTEGER)               AS sample_rate,
               CAST(sum(amp) AS BIGINT)            AS sum_amp,
               CAST(sum(abs(amp)) AS BIGINT)       AS sum_abs,
               CAST(max(abs(amp)) AS INTEGER)      AS max_abs
        FROM a GROUP BY doc_id ORDER BY doc_id""")),

    Q(
      "q172_audio_augment",
      "TRAIN-TIME AUDIO AUGMENTATION on the real codec path (q169's " +
        "pattern on the q118 tier): decode the WAV payload, trim 8 " +
        "samples head and tail, apply 2x GAIN with hard CLIPPING at " +
        "±3500 — inside the doubled ±4000 amplitude range, so clipping " +
        "genuinely fires and its count is an output column pinning the " +
        "clamp semantics to the oracle. Gain is pure integer " +
        "multiplication: integer DIVISION is avoided on purpose, its " +
        "negative-operand semantics (truncate vs floor) differ between " +
        "engines. Payloads never leave their partition.",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        val media = ids.mapPartitions(_.map(id => (id, encodeWav(id))))
          .toDF("doc_id", "payload")
        media.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, wav) => augmentWavFeatures(id, wav) })
          .toDF()
          .orderBy($"doc_id")
      },
      Some("""
        WITH par AS (
          SELECT doc_id, 64 + doc_id % 33 AS n FROM documents),
        s AS (
          SELECT doc_id, n, unnest(range(8, n - 8)) AS i FROM par),
        a AS (
          SELECT doc_id, n, ((doc_id * 37 + i * 13) % 4001) - 2000 AS amp FROM s),
        g AS (
          SELECT doc_id, n,
                 least(greatest(2 * amp, -3500), 3500) AS ga,
                 CASE WHEN 2 * amp > 3500 OR 2 * amp < -3500
                      THEN 1 ELSE 0 END AS clipped
          FROM a)
        SELECT doc_id,
               CAST(any_value(n - 16) AS INTEGER) AS n_samples,
               CAST(sum(ga) AS BIGINT)            AS sum_amp,
               CAST(sum(abs(ga)) AS BIGINT)       AS sum_abs,
               CAST(sum(clipped) AS BIGINT)       AS n_clipped
        FROM g GROUP BY doc_id ORDER BY doc_id""")),

    Q(
      "q147_video_codec",
      "REAL multi-frame (video-style) codec path — the q114/q118 pattern " +
        "completing the media tier: doc_id-seeded grayscale frame " +
        "sequences are encoded as ANIMATED GIFs with the JDK's real " +
        "multi-image codec (ImageWriter.writeToSequence) in one narrow " +
        "mapPartitions, then the container is parsed back with ImageIO's " +
        "multi-image reader — frame count and dims come from the decoded " +
        "GIF, not the generator — and every 2nd frame is DECODED and " +
        "feature-summed (the keyframe-sampling access pattern q84 " +
        "exercises on stub bytes, here on a real codec). Grayscale " +
        "frames make the GIF palette round-trip lossless, so the " +
        "sampled-frame sums equal the closed-form pixel function and " +
        "the query is fully SQL-oracle-able. Scale shape unchanged: " +
        "payloads are born and die inside one partition; only scalar " +
        "features leave the map.",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        val media = ids.mapPartitions(_.map(id => (id, encodeGif(id))))
          .toDF("doc_id", "payload")
        media.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, gif) => decodeGifFrameSample(id, gif) })
          .toDF()
          .orderBy($"doc_id")
      },
      Some("""
        WITH par AS (
          SELECT doc_id, 4 + doc_id % 4 AS w, 3 + doc_id % 3 AS h,
                 2 + doc_id % 4 AS nf
          FROM documents),
        k AS (SELECT *, unnest(range(0, nf)) AS f FROM par),
        ks AS (SELECT * FROM k WHERE f % 2 = 0),
        px AS (SELECT doc_id, w, h, nf, f, unnest(range(0, w * h)) AS p FROM ks),
        c AS (SELECT doc_id, w, h, nf, f, p % w AS x, p // w AS y FROM px)
        SELECT doc_id,
               CAST(any_value(nf) AS INTEGER) AS n_frames,
               CAST(count(DISTINCT f) AS INTEGER) AS n_sampled,
               CAST(any_value(w) AS INTEGER) AS width,
               CAST(any_value(h) AS INTEGER) AS height,
               CAST(sum((doc_id * 29 + f * 41 + x * 7 + y * 13) % 256) AS BIGINT)
                 AS sampled_sum
        FROM c GROUP BY doc_id ORDER BY doc_id""")),

    Q(
      "q202_keyframe_detect",
      "CONTENT-BASED KEYFRAME / SHOT-BOUNDARY DETECTION on the real " +
        "codec path — where q147 samples frames by POSITION (every " +
        "2nd), this selects them by CONTENT: every frame of the " +
        "animated GIF is decoded and diffed against the previous " +
        "decoded frame (sum of absolute gray differences, the classic " +
        "shot-change energy), and frames at-or-above the mean-diff " +
        "threshold are flagged keyframes — the dedup-adjacent curation " +
        "step that keeps one frame per shot instead of N near-identical " +
        "ones. The generator's pixel function makes every inter-frame " +
        "pixel delta exactly 41 or 215 (mod-256 wraparound), so the " +
        "decoded diff sums — and the 69·w·h threshold verdicts — are " +
        "closed-form SQL. Scale shape: payloads are born and die inside " +
        "one partition (one narrow mapPartitions each way), the " +
        "consecutive-frame diff holds O(w·h) live pixels however long " +
        "the sequence, and only (frame_idx, diff_sum, verdict) scalars " +
        "ever leave the map — at 100 TB of video this is the plan that " +
        "never ships a decoded frame across the wire.",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        ids.mapPartitions(_.map(id => (id, encodeGif(id))))
          .mapPartitions(_.flatMap { case (id, gif) =>
            decodeGifKeyframes(id, gif) })
          .toDF()
          .orderBy($"doc_id", $"frame_idx")
      },
      Some("""
        WITH par AS (
          SELECT doc_id, 4 + doc_id % 4 AS w, 3 + doc_id % 3 AS h,
                 2 + doc_id % 4 AS nf
          FROM documents),
        k AS (SELECT *, unnest(range(1, nf)) AS f FROM par),
        px AS (SELECT doc_id, w, h, f, unnest(range(0, w * h)) AS p FROM k),
        c AS (SELECT doc_id, w, h, f, p % w AS x, p // w AS y FROM px),
        d AS (SELECT doc_id, f, w, h,
                     sum(CASE WHEN (doc_id * 29 + (f - 1) * 41 + x * 7 + y * 13)
                                   % 256 >= 215
                              THEN 215 ELSE 41 END) AS diff_sum
              FROM c GROUP BY doc_id, f, w, h)
        SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
               CAST(diff_sum AS BIGINT) AS diff_sum,
               diff_sum >= 69 * w * h AS is_key
        FROM d ORDER BY doc_id, frame_idx""")),

    Q(
      "q205_image_dhash",
      "PERCEPTUAL-HASH IMAGE NEAR-DUP (dHash) on the real codec path — " +
        "the pHash/dHash dedup step LAION-class multimodal pipelines " +
        "run, where q60/q61 hash exact bytes: each PNG is DECODED, " +
        "dHash'd (bit per horizontal gradient sign, the resize-to-" +
        "thumbnail step being the identity on these already-tiny " +
        "fixtures), then a brightness augment (+8 clamped at 255) of " +
        "the SAME decoded pixels is hashed again — matched rows are " +
        "docs whose fingerprint survived the augment, i.e. an exact " +
        "hash-equality dedup (q60's groupBy shape on the perceptual " +
        "key) would catch that near-duplicate; the unmatched rest sit " +
        "in the clamp-sensitive gradient band (green 247-250), the " +
        "measurable robustness/sensitivity frontier of the hash. The " +
        "generator's linear-mod-256 pixel ramp gives the bits a closed " +
        "form (orig: g < 251; bright: g < 247), so both 42-bit-max " +
        "fingerprints oracle bit-exactly. Scale shape: q114's — " +
        "payloads are born, decoded, augmented, and hashed inside one " +
        "partition; only two int64 fingerprints per doc ever leave " +
        "the map (banding those into Hamming buckets is q64's SimHash " +
        "recipe, unchanged).",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        ids.mapPartitions(_.map(id => (id, encodePng(id))))
          .mapPartitions(_.map { case (id, png) => dhashBrightPair(id, png) })
          .toDF()
          .orderBy($"doc_id")
      },
      Some("""
        WITH par AS (SELECT doc_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
                     FROM documents),
        px AS (SELECT doc_id, w, unnest(range(0, (w - 1) * h)) AS i FROM par),
        g AS (SELECT doc_id, i,
                     (doc_id * 17 + 5 * (i % (w - 1)) + 11 * (i // (w - 1)))
                       % 256 AS gv
              FROM px),
        b AS (SELECT doc_id,
                     sum(CASE WHEN gv < 251
                              THEN (CAST(1 AS BIGINT) << CAST(i AS INTEGER))
                              ELSE 0 END) AS dhash_orig,
                     sum(CASE WHEN gv < 247
                              THEN (CAST(1 AS BIGINT) << CAST(i AS INTEGER))
                              ELSE 0 END) AS dhash_bright
              FROM g GROUP BY doc_id)
        SELECT doc_id, CAST(dhash_orig AS BIGINT) AS dhash_orig,
               CAST(dhash_bright AS BIGINT) AS dhash_bright,
               dhash_orig = dhash_bright AS matched
        FROM b ORDER BY doc_id""")),

    Q(
      "q221_augment_distortion",
      "AUGMENTATION DISTORTION AUDIT on the real codec path — the " +
        "quantitative tier above q205's binary matched/unmatched: per " +
        "doc, the exact integer sum of squared per-channel pixel diffs " +
        "(SSE, the core of PSNR without its cross-engine float log) " +
        "between the decoded PNG and its +8-clamp brightness augment, " +
        "plus MSE in 1e-4 fixed point via truncating div. How a " +
        "multimodal pipeline verifies an augment stays perceptually " +
        "bounded BEFORE burning GPU-hours training on it. Every channel " +
        "diff is 8 below the clamp knee and 255-c at it, so the " +
        "real-decode measurement oracles bit-exactly against the " +
        "generator's closed-form ramp (q114's lossless-PNG argument). " +
        "Scale shape: payloads are born, decoded, diffed, and reduced " +
        "to three int64s inside one partition; only (doc_id, n_px, " +
        "sse) ever leaves the map — no shuffle before the bounded " +
        "ORDER BY.",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        ids.mapPartitions(_.map(id => (id, encodePng(id))))
          .mapPartitions(_.map { case (id, png) => augmentSse(id, png) })
          .toDF()
          .withColumn("mse_e4", expr("(10000 * sse) div (3 * n_px)"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH par AS (SELECT doc_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
                     FROM documents),
        px AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM par),
        ch AS (SELECT doc_id, w, h,
                      (doc_id * 31 + (i % w) * 7 + (i // w) * 13) % 256 AS r,
                      (doc_id * 17 + (i % w) * 5 + (i // w) * 11) % 256 AS g,
                      (doc_id * 23 + (i % w) * 3 + (i // w) * 19) % 256 AS b
               FROM px),
        e AS (SELECT doc_id, w * h AS n_px,
                     sum(CASE WHEN r < 248 THEN 64 ELSE (255-r)*(255-r) END
                       + CASE WHEN g < 248 THEN 64 ELSE (255-g)*(255-g) END
                       + CASE WHEN b < 248 THEN 64 ELSE (255-b)*(255-b) END)
                       AS sse
              FROM ch GROUP BY doc_id, w * h)
        SELECT doc_id, CAST(n_px AS BIGINT) AS n_px,
               CAST(sse AS BIGINT) AS sse,
               CAST((10000 * sse) // (3 * n_px) AS BIGINT) AS mse_e4
        FROM e ORDER BY doc_id""")),

    Q(
      "q84_multimodal_framesample",
      "Frame sampling: treat the payload as fixed-size frames (16 B), " +
        "sample every 4th, explode to one row per sampled frame with a " +
        "per-frame md5 checksum — the video keyframe-extraction access " +
        "pattern (generator/explode over substrings of the payload). md5 " +
        "renders identically here and in DuckDB, which is what lets this " +
        "row be oracled at all (swap in xxhash64 for a cheaper 8-byte " +
        "checksum when cross-engine reproducibility isn't needed).",
      (s, dir) => {
        import s.implicits._
        Tables.t(s, dir, "documents")
          // byte-frames vs the oracle's char-substrings only agree on
          // pure-ASCII text (bytes == chars): make that explicit rather
          // than rely on the fixtures — a multi-byte char would shift
          // Spark's byte framing off the oracle's char framing and md5
          // a replacement-char-mangled cast. Both sides exclude such
          // rows identically (no-op on the all-ASCII fixtures).
          .filter(length($"text") === octet_length($"text"))
          .select($"doc_id", $"text".cast("binary").as("payload"))
          // sub-frame payloads have no complete frame (none in the
          // fixtures, but sequence(0, -1) would DESCEND, not stay empty)
          .filter(length($"payload") >= 16)
          .select($"doc_id",
            posexplode(expr(
              """transform(sequence(0, int(floor(length(payload) / 16.0)) - 1),
                 f -> substring(payload, f * 16 + 1, 16))"""))
              .as(Seq("frame_idx", "frame")))
          .filter($"frame_idx" % 4 === 0)
          .select($"doc_id", $"frame_idx",
            md5($"frame".cast("string")).as("frame_hash"))
          .orderBy($"doc_id", $"frame_idx")
      },
      Some("""
        WITH f AS (SELECT doc_id, text,
                          unnest(range(0, CAST(floor(length(text) / 16.0) AS INTEGER)))
                            AS frame_idx
                   FROM documents
                   WHERE length(text) = octet_length(encode(text))
                     AND length(text) >= 16)
        SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
               md5(substring(text, CAST(frame_idx AS INTEGER) * 16 + 1, 16)) AS frame_hash
        FROM f WHERE frame_idx % 4 = 0
        ORDER BY doc_id, frame_idx""")),

    Q(
      "q180_image_patchify",
      "ViT-STYLE PATCH EXTRACTION on the real codec path: decode the " +
        "PNG payload (q114's ImageIO tier) and split each image into " +
        "non-overlapping 2x2 patches — the patch-embedding front end of " +
        "a vision transformer, where every patch becomes one input " +
        "token. Per patch: grid position and integer channel sums " +
        "(exact vs the closed-form pixel function; the trailing odd " +
        "row/column is cropped, as ViT does). The row count EXPANDS " +
        "(~6 patches per fixture image), which is what makes this a " +
        "distinct shape from q114/q169's per-image scalars: a generator " +
        "whose output is bounded by pixels/4, still born and dying " +
        "inside one partition — only patch feature rows leave the map, " +
        "never payload bytes.",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        val media = ids.mapPartitions(_.map(id => (id, encodePng(id))))
          .toDF("doc_id", "payload")
        media.as[(Long, Array[Byte])]
          .mapPartitions(_.flatMap { case (id, png) => patchifyPng(id, png) })
          .toDF()
          .orderBy($"doc_id", $"patch_id")
      },
      Some("""
        WITH dims AS (
          SELECT doc_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
          FROM documents),
        g AS (SELECT doc_id, w, h, w // 2 AS pw, h // 2 AS ph FROM dims),
        p AS (SELECT doc_id, w, pw, unnest(range(0, pw * ph)) AS pid FROM g),
        c AS (SELECT doc_id, pid, pid % pw AS px, pid // pw AS py FROM p)
        SELECT doc_id,
               CAST(pid AS INTEGER) AS patch_id,
               CAST(px AS INTEGER) AS px,
               CAST(py AS INTEGER) AS py,
               CAST(list_sum([(doc_id * 31 + (2 * px + i % 2) * 7
                               + (2 * py + i // 2) * 13) % 256
                              for i in range(0, 4)]) AS BIGINT) AS sum_r,
               CAST(list_sum([(doc_id * 17 + (2 * px + i % 2) * 5
                               + (2 * py + i // 2) * 11) % 256
                              for i in range(0, 4)]) AS BIGINT) AS sum_g,
               CAST(list_sum([(doc_id * 23 + (2 * px + i % 2) * 3
                               + (2 * py + i // 2) * 19) % 256
                              for i in range(0, 4)]) AS BIGINT) AS sum_b
        FROM c ORDER BY doc_id, patch_id""")),

    Q(
      "q190_audio_framing",
      "ASR-STYLE FRAME EXTRACTION on the real audio codec path — q180's " +
        "patchify applied to sound: decode the WAV payload (q118's " +
        "javax.sound tier) and split each clip into non-overlapping " +
        "32-sample frames, the fixed-frame front end every speech " +
        "pipeline runs before spectral features; per frame, integer " +
        "amplitude sum, absolute-amplitude sum (the energy proxy), and " +
        "peak — all exact vs the closed-form sample function (the " +
        "trailing partial frame is dropped, as fixed-frame windows do). " +
        "Row count EXPANDS ~2-3 frames per clip; payloads are born and " +
        "die inside one partition, only scalar frame rows leave the map.",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        val media = ids.mapPartitions(_.map(id => (id, encodeWav(id))))
          .toDF("doc_id", "payload")
        media.as[(Long, Array[Byte])]
          .mapPartitions(_.flatMap { case (id, wav) => frameWavFeatures(id, wav) })
          .toDF()
          .orderBy($"doc_id", $"frame_id")
      },
      Some("""
        WITH dims AS (
          SELECT doc_id, 64 + doc_id % 33 AS n FROM documents),
        f AS (SELECT doc_id, unnest(range(0, n // 32)) AS fid FROM dims)
        SELECT doc_id,
               CAST(fid AS INTEGER) AS frame_id,
               CAST(list_sum([(doc_id * 37 + i * 13) % 4001 - 2000
                              for i in range(fid * 32, fid * 32 + 32)])
                 AS BIGINT) AS sum_amp,
               CAST(list_sum([abs((doc_id * 37 + i * 13) % 4001 - 2000)
                              for i in range(fid * 32, fid * 32 + 32)])
                 AS BIGINT) AS sum_abs,
               CAST(list_max([abs((doc_id * 37 + i * 13) % 4001 - 2000)
                              for i in range(fid * 32, fid * 32 + 32)])
                 AS INTEGER) AS max_abs
        FROM f ORDER BY doc_id, frame_id""")),

    Q(
      "q192_image_text_pairs",
      "IMAGE-TEXT PAIR CURATION (CLIP/LAION-style training-set " +
        "assembly): join each document's DECODED image dimensions " +
        "(q114's real codec tier — the payload is decoded, not trusted " +
        "from metadata) with its caption's token stats, apply the " +
        "standard pair filters (image area >= 24 px, caption 5..60 " +
        "tokens), and report the per-language curation ledger: " +
        "candidates, kept pairs, kept caption tokens, kept pixels. The " +
        "multimodal JOIN is the point — codec features and text " +
        "features are computed in separate map passes (each payload " +
        "born and dying in its own partition) and meet on doc_id, the " +
        "shape a 100 TB pair-curation pipeline has: one equi-join on " +
        "the pair key, integer filters, one small aggregate. All " +
        "arithmetic integer-exact.",
      (s, dir) => {
        import s.implicits._
        val dims = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
          .mapPartitions(_.map { id =>
            val f = decodePngFeatures(id, encodePng(id))
            (id, f.width, f.height)
          })
          .toDF("doc_id", "w", "h")
        val caps = Tables.t(s, dir, "documents")
          .select($"doc_id", $"lang",
            size(filter(split(trim($"text"), " "), x => x =!= lit("")))
              .cast("long").as("n_tok"))
        caps.join(dims, Seq("doc_id"))
          .withColumn("kept",
            ($"w" * $"h" >= 24 && $"n_tok" >= 5 && $"n_tok" <= 60)
              .cast("long"))
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_candidates"),
            sum($"kept").as("n_kept"),
            sum($"kept" * $"n_tok").as("tokens_kept"),
            sum($"kept" * $"w" * $"h").as("pixels_kept"))
          .orderBy($"lang")
      },
      Some("""
        WITH dims AS (
          SELECT doc_id, 4 + doc_id % 5 AS w, 4 + doc_id % 3 AS h
          FROM documents),
        caps AS (
          SELECT doc_id, lang,
                 CAST(len(list_filter(string_split(trim(text), ' '),
                                      x -> x <> '')) AS BIGINT) AS n_tok
          FROM documents),
        j AS (
          SELECT caps.lang, caps.n_tok, dims.w, dims.h,
                 CASE WHEN dims.w * dims.h >= 24
                       AND caps.n_tok BETWEEN 5 AND 60
                      THEN 1 ELSE 0 END AS kept
          FROM caps JOIN dims USING (doc_id))
        SELECT lang,
               count(*) AS n_candidates,
               CAST(sum(kept) AS BIGINT) AS n_kept,
               CAST(sum(kept * n_tok) AS BIGINT) AS tokens_kept,
               CAST(sum(kept * w * h) AS BIGINT) AS pixels_kept
        FROM j GROUP BY lang ORDER BY lang""")),

    Q(
      "q275_audio_spectral",
      "EXACT SPECTRAL FEATURES on the real audio codec path — DFT bin " +
        "energies over each clip's first 64 decoded samples at the " +
        "three bins whose 64-point twiddle factors are exactly " +
        "{0, +/-1}: DC (k=0, loudness offset), the quarter band (k=16, " +
        "coefficients cycling 1,-i,-1,i — energy near 2 kHz at the " +
        "8 kHz fixture rate), and Nyquist (k=32, alternating signs — " +
        "the aliasing/noise indicator), plus the 64-sample energy " +
        "(the Parseval reference: each bin energy is bounded by " +
        "64*sum_sq, spec-checked). Choosing the exactly-representable " +
        "bins keeps the WHOLE feature integer — no cos(), no " +
        "cross-engine libm ULP surface (q238's log10-literal rule " +
        "applied to signal processing); a production mel filterbank " +
        "would precompute micro-scaled twiddle literals the same way. " +
        "Payloads are born and die in one partition (q118's shape); " +
        "WAV PCM is lossless, so the decoded-sample energies equal the " +
        "closed-form amplitude function and the oracle is bit-exact.",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        ids.mapPartitions(_.map(id => (id, encodeWav(id))))
          .mapPartitions(_.map { case (id, wav) => spectralWavFeatures(id, wav) })
          .toDF()
          .orderBy($"doc_id")
      },
      Some("""
        WITH s AS (
          SELECT doc_id, unnest(range(0, 64)) AS i FROM documents),
        a AS (
          SELECT doc_id, i,
                 ((doc_id * 37 + i * 13) % 4001) - 2000 AS amp
          FROM s),
        g AS (
          SELECT doc_id,
                 sum(amp) AS su,
                 sum(CASE WHEN i % 2 = 0 THEN amp ELSE -amp END) AS alt,
                 sum(CASE WHEN i % 4 = 0 THEN amp
                          WHEN i % 4 = 2 THEN -amp ELSE 0 END) AS re,
                 sum(CASE WHEN i % 4 = 1 THEN -amp
                          WHEN i % 4 = 3 THEN amp ELSE 0 END) AS im,
                 sum(amp * amp) AS sq
          FROM a GROUP BY doc_id)
        SELECT doc_id,
               CAST(su * su AS BIGINT) AS e_dc,
               CAST(re * re + im * im AS BIGINT) AS e_quarter,
               CAST(alt * alt AS BIGINT) AS e_nyquist,
               CAST(sq AS BIGINT) AS sum_sq64
        FROM g ORDER BY doc_id""")),

    Q(
      "q346_audio_vad_segments",
      "ENERGY-BASED VOICE-ACTIVITY SEGMENTATION on the real audio " +
        "codec path — the first pass every speech-data pipeline runs " +
        "to cut raw recordings into utterances before ASR/training: " +
        "decode the WAV (q118's javax.sound tier), frame at 16 " +
        "samples (2 ms at 8 kHz; the trailing partial frame drops as " +
        "fixed-frame windows do), mark a frame ACTIVE when its " +
        "absolute-amplitude energy strictly exceeds the clip's mean " +
        "frame energy (cross-multiplied exact: sum_abs * n_frames > " +
        "total_abs — no division), and merge adjacent active frames " +
        "into segments by the island trick (frame_id minus the " +
        "active-frame row_number is constant within a run). Per-clip " +
        "ledger: frames, active frames, segment count, longest " +
        "segment. Payloads are born and die in one partition (q118's " +
        "shape) — only (doc_id, frame_id, energy) scalars leave the " +
        "map; the windows are all doc-partitioned, so 10^9 clips " +
        "scale by partition count alone. WAV PCM is lossless, so " +
        "decoded energies equal the closed-form amplitude function " +
        "and the oracle replays the whole pipeline bit-exactly in " +
        "SQL.",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        val frames = ids
          .mapPartitions(_.map(id => (id, encodeWav(id))))
          .mapPartitions(_.flatMap { case (id, wav) =>
            vadFrameEnergies(id, wav) })
          .toDF("doc_id", "frame_id", "sum_abs")
        val byDoc = Window.partitionBy($"doc_id")
        val act = frames
          .withColumn("nf", count(lit(1)).over(byDoc))
          .withColumn("tot", sum($"sum_abs").over(byDoc))
          .withColumn("active", $"sum_abs" * $"nf" > $"tot")
        val segs = act.filter($"active")
          .withColumn("grp", $"frame_id" - row_number().over(
            Window.partitionBy($"doc_id").orderBy($"frame_id")))
          .groupBy($"doc_id", $"grp").agg(count(lit(1)).as("seg_len"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_segments"),
            sum($"seg_len").as("active_frames"),
            max($"seg_len").as("max_seg_len"))
        act.groupBy($"doc_id").agg(count(lit(1)).as("n_frames"))
          .join(segs, Seq("doc_id"), "left")
          .select($"doc_id", $"n_frames",
            coalesce($"active_frames", lit(0L)).as("active_frames"),
            coalesce($"n_segments", lit(0L)).as("n_segments"),
            coalesce($"max_seg_len", lit(0L)).as("max_seg_len"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH dims AS (
          SELECT doc_id, 64 + doc_id % 33 AS n FROM documents),
        f AS (SELECT doc_id, unnest(range(0, n // 16)) AS fid FROM dims),
        e AS (SELECT doc_id, fid,
                CAST(list_sum([abs((doc_id * 37 + i * 13) % 4001 - 2000)
                               for i in range(fid * 16, fid * 16 + 16)])
                  AS BIGINT) AS sa
              FROM f),
        d AS (SELECT doc_id, fid, sa,
                count(*) OVER (PARTITION BY doc_id) AS nf,
                sum(sa) OVER (PARTITION BY doc_id) AS tot FROM e),
        seg AS (SELECT doc_id,
                  fid - row_number() OVER (PARTITION BY doc_id
                    ORDER BY fid) AS grp
                FROM d WHERE sa * nf > tot),
        sl AS (SELECT doc_id, grp, count(*) AS seg_len
               FROM seg GROUP BY 1, 2),
        ds AS (SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_segments,
                 CAST(sum(seg_len) AS BIGINT) AS active_frames,
                 CAST(max(seg_len) AS BIGINT) AS max_seg_len
               FROM sl GROUP BY 1),
        nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames
               FROM d GROUP BY 1)
        SELECT nf.doc_id, nf.n_frames,
               coalesce(ds.active_frames, 0) AS active_frames,
               coalesce(ds.n_segments, 0) AS n_segments,
               coalesce(ds.max_seg_len, 0) AS max_seg_len
        FROM nf LEFT JOIN ds ON nf.doc_id = ds.doc_id
        ORDER BY nf.doc_id""")),

    Q(
      "q350_binaryfile_ingest",
      "BINARY-FILE LANDING-ZONE INGEST — the spark.read.format" +
        "('binaryFile') source every multimodal pipeline starts from " +
        "(a directory of media files in an object store, one file " +
        "per asset, no parquet yet): WAV clips are WRITTEN one file " +
        "per doc in a distributed foreachPartition (the landing-zone " +
        "simulation), read back through the binaryFile DataSource " +
        "(path/length/content schema — the content column is the " +
        "real file bytes, the asset id is parsed from the PATH, the " +
        "ingest pattern's defining move), decoded with the real " +
        "javax.sound codec, and the per-clip feature row emitted. " +
        "file_bytes pins the WHOLE byte path: the canonical RIFF " +
        "header is 44 bytes, so length must equal 44 + 2n exactly — " +
        "a writer or source regression that pads, truncates, or " +
        "re-encodes goes driver-red. Differs from q118 (in-memory " +
        "payload column): here the bytes cross a filesystem and " +
        "return through a DataSource scan with its own partitioning " +
        "(maxPartitionBytes applies to media files too). Payloads " +
        "still die in the partition that read them.",
      (s, dir) => {
        import s.implicits._
        val root = graft.TempRoots.freshForDir("graft_binwav", dir)
          .toString
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        ids.foreachPartition { it: Iterator[Long] =>
          it.foreach { id =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(root, f"$id%06d.wav"),
              encodeWav(id))
          }
        }
        s.read.format("binaryFile").load(root)
          .select($"path", $"length", $"content")
          .as[(String, Long, Array[Byte])]
          .map { case (path, len, bytes) =>
            val id = path.split("/").last.stripSuffix(".wav").toLong
            val f = decodeWavFeatures(id, bytes)
            (f.doc_id, f.n_samples, f.sample_rate, len,
              f.sum_amp, f.sum_abs, f.max_abs)
          }
          .toDF("doc_id", "n_samples", "sample_rate", "file_bytes",
            "sum_amp", "sum_abs", "max_abs")
          .orderBy($"doc_id")
      },
      Some("""
        WITH par AS (
          SELECT doc_id, 64 + doc_id % 33 AS n FROM documents),
        s AS (
          SELECT doc_id, n, unnest(range(0, n)) AS i FROM par),
        a AS (
          SELECT doc_id, n,
                 ((doc_id * 37 + i * 13) % 4001) - 2000 AS amp
          FROM s)
        SELECT doc_id,
               CAST(min(n) AS INTEGER) AS n_samples,
               CAST(8000 AS INTEGER) AS sample_rate,
               CAST(44 + 2 * min(n) AS BIGINT) AS file_bytes,
               CAST(sum(amp) AS BIGINT) AS sum_amp,
               CAST(sum(abs(amp)) AS BIGINT) AS sum_abs,
               CAST(max(abs(amp)) AS INTEGER) AS max_abs
        FROM a GROUP BY doc_id ORDER BY doc_id""")),

    Q(
      "q359_audio_resample",
      "2x AUDIO UPSAMPLING on the real codec path (the sample-rate " +
        "conversion every speech pipeline runs before a fixed-rate " +
        "model; q118's tier): decode the WAV payload, LINEAR-" +
        "INTERPOLATE to 2n-1 samples (even j keeps x[j/2], odd j is " +
        "the truncating integer midpoint (x[k]+x[k+1])/2 — truncation " +
        "chosen because it is what BOTH engines' integer division " +
        "does, so the oracle recomputes the resampled signal " +
        "closed-form), then RE-ENCODE through the codec at 16 kHz and " +
        "decode back — the features come from the roundtripped bytes, " +
        "so header, rate, and sample count are codec-attested. " +
        "Payloads are born and die inside one partition; only scalar " +
        "features leave the map. 100 TB: a pure map pass, zero " +
        "shuffle beyond the final tiny sort.",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        val media = ids.mapPartitions(_.map(id => (id, encodeWav(id))))
          .toDF("doc_id", "payload")
        media.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, wav) =>
            resampleWavFeatures(id, wav) })
          .toDF()
          .orderBy($"doc_id")
      },
      Some("""
        WITH par AS (
          SELECT doc_id, 64 + doc_id % 33 AS n FROM documents),
        s AS (
          SELECT doc_id, n, unnest(range(0, 2 * n - 1)) AS j FROM par),
        o AS (
          SELECT doc_id, n,
                 CASE WHEN j % 2 = 0
                   THEN ((doc_id * 37 + (j // 2) * 13) % 4001) - 2000
                   ELSE ((((doc_id * 37 + ((j - 1) // 2) * 13) % 4001)
                       - 2000)
                     + (((doc_id * 37 + ((j + 1) // 2) * 13) % 4001)
                       - 2000)) // 2
                 END AS amp
          FROM s)
        SELECT doc_id,
               CAST(any_value(n) AS INTEGER)         AS n_in,
               CAST(any_value(2 * n - 1) AS INTEGER) AS n_out,
               CAST(16000 AS INTEGER)                AS out_rate,
               CAST(sum(amp) AS BIGINT)              AS sum_amp_out,
               CAST(sum(abs(amp)) AS BIGINT)         AS sum_abs_out,
               CAST(max(abs(amp)) AS INTEGER)        AS max_abs_out
        FROM o GROUP BY doc_id ORDER BY doc_id""")),

    Q(
      "q360_image_equalize",
      "HISTOGRAM EQUALIZATION on the real image codec path (the " +
        "classic contrast normalization — Gonzalez-Woods eq. 3.3-8 in " +
        "integer form — applied to the red channel): decode the PNG, " +
        "build the 256-bin histogram, map each level through the " +
        "integer CDF transfer (cdf(v)-cdfmin)*255 div (n-cdfmin), and " +
        "emit the before/after channel sums plus the mapped range — " +
        "max_eq = 255 by construction (the brightest occupied bin " +
        "always maps to full scale), which pins the transfer's " +
        "endpoint to the oracle. All arithmetic is non-negative " +
        "integer division, so truncate-vs-floor cannot diverge " +
        "between engines. The histogram is a per-image 256-int array " +
        "inside the map — never a shuffle. 100 TB: map-only.",
      (s, dir) => {
        import s.implicits._
        val ids = Tables.t(s, dir, "documents").select($"doc_id").as[Long]
        val media = ids.mapPartitions(_.map(id => (id, encodePng(id))))
          .toDF("doc_id", "payload")
        media.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, png) =>
            equalizePngFeatures(id, png) })
          .toDF()
          .orderBy($"doc_id")
      },
      Some("""
        WITH par AS (
          SELECT doc_id, CAST(4 + doc_id % 5 AS INTEGER) AS w,
                 CAST(4 + doc_id % 3 AS INTEGER) AS h
          FROM documents),
        px AS (
          SELECT doc_id, w, h,
                 (doc_id * 31 + (i % w) * 7 + (i // w) * 13) % 256 AS r
          FROM (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i
                FROM par)),
        hist AS (
          SELECT doc_id, w, h, r, CAST(count(*) AS BIGINT) AS c
          FROM px GROUP BY doc_id, w, h, r),
        cdf AS (
          SELECT doc_id, w, h, r, c,
                 sum(c) OVER (PARTITION BY doc_id ORDER BY r) AS cf,
                 min(c) OVER (PARTITION BY doc_id) AS dummy
          FROM hist),
        eq AS (
          SELECT doc_id, w, h, r, c, cf,
                 min(cf) OVER (PARTITION BY doc_id) AS cfmin,
                 CAST(w * h AS BIGINT) AS n
          FROM cdf),
        m AS (
          SELECT doc_id, w, h, r, c,
                 CASE WHEN n = cfmin THEN 255
                      ELSE (cf - cfmin) * 255 // (n - cfmin) END AS v
          FROM eq)
        SELECT doc_id, CAST(any_value(w) AS INTEGER) AS w,
               CAST(any_value(h) AS INTEGER) AS h,
               CAST(sum(c * r) AS BIGINT) AS sum_r_in,
               CAST(sum(c * v) AS BIGINT) AS sum_r_eq,
               CAST(count(*) AS INTEGER) AS distinct_r,
               CAST(min(v) AS INTEGER) AS min_eq,
               CAST(max(v) AS INTEGER) AS max_eq
        FROM m GROUP BY doc_id ORDER BY doc_id"""))
  )

  /** 16-sample frame energies for q346's VAD pass: (frame_id, sum of
    * absolute 16-bit LE mono amplitudes). Same decode tier and framing
    * discipline as frameWavFeatures (trailing partial frame dropped);
    * kept separate because VAD frames (2 ms) are finer than the ASR
    * feature frames (4 ms) — the two front ends really do differ. */
  def vadFrameEnergies(id: Long, payload: Array[Byte])
      : Seq[(Long, Int, Long)] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          && fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1
          && !fmt.isBigEndian,
        s"doc $id: expected 16-bit signed LE mono PCM, got $fmt")
      val pcm = ais.readAllBytes()
      val nFrames = pcm.length / 2 / 16
      for (f <- 0 until nFrames) yield {
        var sumAbs = 0L
        var i = f * 16
        while (i < (f + 1) * 16) {
          val amp = (((pcm(i * 2 + 1) & 0xff) << 8) |
            (pcm(i * 2) & 0xff)).toShort.toInt
          sumAbs += math.abs(amp)
          i += 1
        }
        (id, f, sumAbs)
      }
    } finally ais.close()
  }

  /** q359's resampled-clip features. Field order = output schema. */
  final case class ResampledAudio(
      doc_id: Long, n_in: Int, n_out: Int, out_rate: Int,
      sum_amp_out: Long, sum_abs_out: Long, max_abs_out: Int)

  /** Decode the WAV payload, 2x linear-interp upsample (truncating
    * integer midpoints — the division BOTH engines truncate), re-encode
    * at 16 kHz through the real codec, decode the roundtripped bytes,
    * and extract features from THOSE samples (q359). */
  def resampleWavFeatures(id: Long, payload: Array[Byte]): ResampledAudio = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val pcm =
      try ais.readAllBytes()
      finally ais.close()
    val n = pcm.length / 2
    def sample(arr: Array[Byte], i: Int): Int =
      (((arr(i * 2 + 1) & 0xff) << 8) | (arr(i * 2) & 0xff)).toShort.toInt
    val out = new Array[Byte]((2 * n - 1) * 2)
    var j = 0
    while (j < 2 * n - 1) {
      val amp =
        if (j % 2 == 0) sample(pcm, j / 2)
        else (sample(pcm, (j - 1) / 2) + sample(pcm, (j + 1) / 2)) / 2
      out(j * 2) = (amp & 0xff).toByte
      out(j * 2 + 1) = ((amp >> 8) & 0xff).toByte
      j += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      16000f, 16, 1, /* signed = */ true, /* bigEndian = */ false)
    val rt = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(out), fmt, (2 * n - 1).toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, rt)
    val back = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(rt.toByteArray))
    try {
      val rate = back.getFormat.getSampleRate.toInt
      val rpcm = back.readAllBytes()
      val m = rpcm.length / 2
      var sum = 0L; var sumAbs = 0L; var maxAbs = 0
      var i = 0
      while (i < m) {
        val a = sample(rpcm, i)
        sum += a; sumAbs += math.abs(a)
        if (math.abs(a) > maxAbs) maxAbs = math.abs(a)
        i += 1
      }
      ResampledAudio(id, n, m, rate, sum, sumAbs, maxAbs)
    } finally back.close()
  }

  /** q360's equalized-image features. Field order = output schema. */
  final case class EqualizedImage(
      doc_id: Long, w: Int, h: Int, sum_r_in: Long, sum_r_eq: Long,
      distinct_r: Int, min_eq: Int, max_eq: Int)

  /** Decode the PNG payload, equalize the red channel through the
    * integer CDF transfer (cdf(v)-cdfmin)*255 div (n-cdfmin), emit
    * before/after sums + mapped range (q360). The 256-bin histogram
    * is a local array — the whole op is one map. */
  def equalizePngFeatures(id: Long, payload: Array[Byte]): EqualizedImage = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, s"doc $id: payload is not a decodable image")
    val w = img.getWidth; val h = img.getHeight; val n = w.toLong * h
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    val hist = new Array[Long](256)
    var sumIn = 0L
    px.foreach { rgb =>
      val r = (rgb >> 16) & 0xff
      hist(r) += 1; sumIn += r
    }
    val cfmin = hist.find(_ > 0).getOrElse(0L)
    var cf = 0L; var sumEq = 0L; var distinct = 0
    var minEq = 255; var maxEq = 0
    var v = 0
    while (v < 256) {
      if (hist(v) > 0) {
        cf += hist(v)
        val mapped =
          if (n == cfmin) 255
          else ((cf - cfmin) * 255 / (n - cfmin)).toInt
        sumEq += hist(v) * mapped
        distinct += 1
        if (mapped < minEq) minEq = mapped
        if (mapped > maxEq) maxEq = mapped
      }
      v += 1
    }
    EqualizedImage(id, w, h, sumIn, sumEq, distinct, minEq, maxEq)
  }
}
