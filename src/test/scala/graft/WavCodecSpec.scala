package graft

import graft.ops.MultimodalOps
import org.scalatest.funsuite.AnyFunSuite

/** The hand-rolled RIFF/WAVE codec against the platform reference
  * implementation (`javax.sound.sampled`): identical bytes out,
  * interchangeable parses, and chunk-walk robustness. javax lives HERE
  * (synchronized provider lookups are fine in a spec) and stays out of
  * the executor hot path — see MultimodalOps.wavBytes.
  */
class WavCodecSpec extends AnyFunSuite {

  private val rate = 8000

  private def pcm(n: Int): Array[Byte] = {
    val b = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = ((i * 37 + 11) % 2048) - 1024
      b(2 * i) = (s & 0xff).toByte
      b(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    b
  }

  private def javaxWav(p: Array[Byte]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, 16, 1, 2, rate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(p), fmt, p.length / 2L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    ais.close()
    bos.toByteArray
  }

  test("wavBytes is byte-identical to the javax WAVE writer") {
    Seq(1, 7, 256, 511).foreach { n =>
      val p = pcm(n)
      assert(MultimodalOps.wavBytes(p, rate).toSeq == javaxWav(p).toSeq,
        s"container bytes diverge at n=$n")
    }
  }

  test("wavPcm parses javax-written files and round-trips its own") {
    val p = pcm(300)
    val (fromJavax, r1) = MultimodalOps.wavPcm(javaxWav(p))
    assert(fromJavax.toSeq == p.toSeq && r1 == rate)
    val (roundTrip, r2) = MultimodalOps.wavPcm(MultimodalOps.wavBytes(p, rate))
    assert(roundTrip.toSeq == p.toSeq && r2 == rate)
  }

  test("javax parses wavBytes output (reference cross-validation)") {
    val p = pcm(128)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(MultimodalOps.wavBytes(p, rate)))
    try {
      val fmt = ais.getFormat
      assert(fmt.getSampleRate == rate.toFloat &&
        fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1)
      assert(ais.readAllBytes().toSeq == p.toSeq)
    } finally ais.close()
  }

  test("chunk walk skips unknown chunks (non-canonical writers)") {
    val p = pcm(64)
    val canonical = MultimodalOps.wavBytes(p, rate)
    // splice a LIST chunk (odd-sized, so word-alignment is exercised)
    // between fmt and data
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++
      Array[Byte](0) // pad byte
    val spliced = canonical.slice(0, 36) ++ extra ++
      canonical.slice(36, canonical.length)
    // fix the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val (parsed, r) = MultimodalOps.wavPcm(spliced)
    assert(parsed.toSeq == p.toSeq && r == rate)
  }

  test("corrupt payloads fail loudly") {
    intercept[IllegalArgumentException] {
      MultimodalOps.wavPcm("not a wav at all".getBytes)
    }
  }

  /** Closed-form fingerprint from the law, bypassing codec + framing —
    * the independent recomputation the audio_fingerprint oracle also
    * performs. */
  private def lawFp(id: Long): Long = {
    def e(f: Int): Long = math.abs(MultimodalOps.afMagRaw(id, f) - 1024)
    (0 until 56).map(f => if (e(f + 1) > e(f)) 1L << f else 0L).sum
  }

  test("audio fingerprint: container round-trip equals the closed-form law") {
    (0L until 25L).foreach { id =>
      val n = MultimodalOps.AfFrames * MultimodalOps.AfFrameW
      val p = new Array[Byte](2 * n)
      (0 until n).foreach { i =>
        val mag = (MultimodalOps.afMagRaw(id, i / MultimodalOps.AfFrameW)
          - 1024).toInt
        val s = if (i % 2 == 0) mag else -mag
        p(2 * i) = (s & 0xff).toByte
        p(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val wav = MultimodalOps.wavBytes(p, rate)
      val (back, _) = MultimodalOps.wavPcm(wav)
      val e = new Array[Long](MultimodalOps.AfFrames)
      (0 until n).foreach { i =>
        val s = ((back(2 * i) & 0xff) | (back(2 * i + 1) << 8)).toShort.toInt
        e(i / MultimodalOps.AfFrameW) += math.abs(s)
      }
      val fp = (0 until 56)
        .map(f => if (e(f + 1) > e(f)) 1L << f else 0L).sum
      assert(fp == lawFp(id), s"doc $id: round-trip fp differs from law")
    }
  }

  test("audio near-dup law plants members within Hamming 2 of their leader") {
    // ≤1 perturbed frame per member ((f+id) % 61 hits at most one of 57
    // frames) flips at most the two adjacent delta bits — the bound the
    // 4-band/maxHamming-3 screen relies on to keep every planted pair
    (0L until 100L).foreach { id =>
      val leader = (id / MultimodalOps.AfGroupSize) * MultimodalOps.AfGroupSize
      val d = java.lang.Long.bitCount(lawFp(id) ^ lawFp(leader))
      assert(d <= 2, s"doc $id is $d bits from leader $leader")
    }
  }
}
