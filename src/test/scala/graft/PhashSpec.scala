package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}

/** Perceptual image hashing: real PNG encode → javax.imageio decode →
  * box-downsample → DCT → 64-bit hash, then Hamming band-bucket near-dup.
  * No oracle exists for this family (DuckDB can't decode images), so the
  * gates are behavioral: scale invariance, edit locality, discrimination,
  * and the pigeonhole recall of the banded join. */
class PhashSpec extends SparkSpec {

  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "JDK must ship a PNG writer")
    bos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // deterministic test scenes. pHash's robustness contract is for
  // STRUCTURED images; a degenerate field (e.g. a pure linear gradient)
  // has near-zero AC spectrum and the median thresholds on numerical
  // noise — so the scenes are smooth sinusoid textures sampled from a
  // continuous field (rescaling resamples the same field).
  private def texture(w: Int, h: Int): Array[Byte] = png(w, h) { (x, y) =>
    val fx = x.toDouble / w; val fy = y.toDouble / h
    val v = 128 + 50 * math.sin(2 * math.Pi * (3 * fx + 1.7 * fy)) +
      40 * math.cos(2 * math.Pi * (1.3 * fx - 2.1 * fy)) +
      25 * math.sin(2 * math.Pi * 5.1 * fx * fy)
    val g = math.max(0, math.min(255, v.toInt))
    (g << 16) | (g << 8) | g
  }
  private def checker(w: Int, h: Int) =
    png(w, h)((x, y) => if (((x / 8) + (y / 8)) % 2 == 0) 0xFFFFFF else 0x000000)

  test("phash64: same scene at 2x the resolution hashes within a few bits (scale invariance)") {
    val a = Multimodal.phash64(texture(64, 64)).get
    val b = Multimodal.phash64(texture(128, 128)).get
    assert(hamming(a, b) <= 4, s"scale 2x moved ${hamming(a, b)} bits")
  }

  test("phash64: a small local edit moves few bits; a different scene moves many") {
    val base = Multimodal.phash64(texture(64, 64)).get
    val baseBytes = texture(64, 64)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(baseBytes))
    for (y <- 28 until 36; x <- 28 until 36) img.setRGB(x, y, 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val e = Multimodal.phash64(bos.toByteArray).get
    val c = Multimodal.phash64(checker(64, 64)).get
    assert(hamming(base, e) <= 7, s"8x8 patch edit moved ${hamming(base, e)} bits")
    assert(hamming(base, c) >= 16, s"different scene only ${hamming(base, c)} bits apart")
    assert(hamming(base, e) < hamming(base, c))
  }

  test("phash64: undecodable bytes yield None; decode is deterministic") {
    assert(Multimodal.phash64(Array[Byte](9, 9, 9, 9)).isEmpty)
    assert(Multimodal.phash64(null).isEmpty)
    val p = texture(32, 32)
    assert(Multimodal.phash64(p) == Multimodal.phash64(p))
    // ~half the bits set (median threshold): never degenerate
    val bits = java.lang.Long.bitCount(Multimodal.phash64(p).get)
    assert(bits >= 16 && bits <= 48, s"degenerate hash: $bits bits set")
  }

  test("imageNearDups: banded join finds the rescaled near-dup, skips the different scene, drops undecodables") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, MediaMeta("image", 0, 0, 0, 0L), texture(64, 64)),
      MediaRow(2L, MediaMeta("image", 0, 0, 0, 0L), texture(128, 128)),
      MediaRow(3L, MediaMeta("image", 0, 0, 0, 0L), checker(64, 64)),
      MediaRow(4L, MediaMeta("image", 0, 0, 0, 0L), Array[Byte](1, 2, 3))
    ).toDS()
    val pairs = Multimodal.imageNearDups(media, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 2L)), s"got $pairs")
    // pigeonhole recall cross-check: the banded result equals brute force
    val hashes = Multimodal.imagePhash(media).collect()
      .flatMap(r => r.phash.map(r.media_id -> _)).toMap
    val brute = for {
      (ida, ha) <- hashes; (idb, hb) <- hashes
      if ida < idb && hamming(ha, hb) <= 6
    } yield (ida, idb)
    assert(pairs.keySet == brute.toSet)
  }
}
