package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The q118 REAL audio codec path: the payload is a genuine RIFF/WAVE
  * file, the decode is a genuine AudioSystem parse (format and frame
  * count from the header), and decoded features match the closed-form
  * amplitude function — locally here, end-to-end in CORRECTNESS via the
  * DuckDB oracle. Mirrors ImageCodecSpec for q114. */
class AudioCodecSpec extends AnyFunSuite {
  import TestSession._

  /** Closed-form reference, independent of the codec round trip. */
  private def expected(id: Long): Multimodal.AudioFeatures = {
    val n = (64 + id % 33).toInt
    var sum = 0L; var sumAbs = 0L; var maxAbs = 0
    for (i <- 0 until n) {
      val amp = (((id * 37 + i * 13) % 4001) - 2000).toInt
      sum += amp
      sumAbs += math.abs(amp)
      maxAbs = math.max(maxAbs, math.abs(amp))
    }
    Multimodal.AudioFeatures(id, n, 8000, sum, sumAbs, maxAbs)
  }

  test("augment: trim+gain+clip matches closed form, and clipping actually fires") {
    def closedForm(id: Long): Multimodal.AugmentedAudio = {
      val n = (64 + id % 33).toInt
      var sum = 0L; var sumAbs = 0L; var clipped = 0L
      for (i <- 8 until n - 8) {
        val amp = (((id * 37 + i * 13) % 4001) - 2000).toInt
        val g0 = 2 * amp
        val ga = math.max(-3500, math.min(3500, g0))
        if (g0 > 3500 || g0 < -3500) clipped += 1
        sum += ga
        sumAbs += math.abs(ga)
      }
      Multimodal.AugmentedAudio(id, n - 16, sum, sumAbs, clipped)
    }
    var clipObserved = false
    (0L to 40L).foreach { id =>
      val got = Multimodal.augmentWavFeatures(id, Multimodal.encodeWav(id))
      assert(got === closedForm(id), s"doc $id")
      if (got.n_clipped > 0) clipObserved = true
    }
    assert(clipObserved, "the ±3500 clamp must fire inside the ±4000 gain range")
  }

  test("encodeWav emits real RIFF/WAVE payloads (magic + AudioSystem-parsable)") {
    Seq(0L, 1L, 7L, 123L, 9999L).foreach { id =>
      val bytes = Multimodal.encodeWav(id)
      assert(new String(bytes.take(4), "US-ASCII") === "RIFF", s"doc $id: no RIFF magic")
      assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE", s"doc $id: no WAVE tag")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        assert(ais.getFrameLength === (64 + id % 33),
          s"doc $id: header frame count")
        assert(ais.getFormat.getSampleRate === 8000f)
      } finally ais.close()
    }
  }

  test("decode(encode(id)) recovers the closed-form features exactly (lossless)") {
    (0L to 40L).foreach { id =>
      val got = Multimodal.decodeWavFeatures(id, Multimodal.encodeWav(id))
      assert(got === expected(id), s"doc $id")
    }
  }

  test("decodeWavFeatures rejects non-audio payloads loudly") {
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      Multimodal.decodeWavFeatures(5L, "not a wav".getBytes("UTF-8"))
    }
  }

  test("q118 corpus query: one feature row per document, all closed-form-exact") {
    val rows = SparkEntry.queries("q118_audio_codec")(spark, sfDir).collect()
    val nDocs = Tables.t(spark, sfDir, "documents").count()
    assert(rows.length.toLong === nDocs)
    rows.foreach { r =>
      val exp = expected(r.getLong(0))
      assert((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getInt(5)) ===
        ((exp.n_samples, exp.sample_rate, exp.sum_amp, exp.sum_abs, exp.max_abs)),
        s"doc ${r.getLong(0)}")
    }
  }

  test("q275 spectral: Parseval bounds hold and a pure quarter-band tone " +
    "concentrates its energy in the quarter bin") {
    import TestSession._
    val rows = SparkEntry.queries("q275_audio_spectral")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (eDc, eQ, eNy, sq) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(sq > 0)
      // Cauchy-Schwarz / Parseval: every bin energy <= N * total energy
      Seq(eDc, eQ, eNy).foreach(e =>
        assert(e <= 64L * sq, s"bin energy $e above the Parseval bound"))
    }
    // synthetic pure tone at k=16 (period 4: 0, a, 0, -a): the quarter
    // bin takes ALL the energy (|X_16|^2 = (N/2 * a)^2 on the imag
    // axis), DC and Nyquist exactly zero — the kernel's selectivity
    val a = 1000
    val pcm = new Array[Byte](64 * 2)
    (0 until 64).foreach { i =>
      val amp = (i % 4) match {
        case 1 => a
        case 3 => -a
        case _ => 0
      }
      pcm(i * 2) = (amp & 0xff).toByte
      pcm(i * 2 + 1) = ((amp >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 64L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val f = graft.operators.Multimodal.spectralWavFeatures(7L, out.toByteArray)
    assert(f.e_dc == 0L && f.e_nyquist == 0L,
      s"pure k=16 tone must vanish at DC/Nyquist: $f")
    assert(f.e_quarter == 32L * a * 32L * a,
      s"quarter bin must hold (N/2*a)^2: $f")
    assert(f.sum_sq64 == 32L * a * a)
  }
}
