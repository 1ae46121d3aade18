package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.MinHashSignature

/** Content-defined shingle sampling (r11, `sampleShift`): the sparse
  * MinHash kernel must equal the full kernel evaluated over exactly the
  * windows whose first hash passes the sample mask — and stay
  * bit-identical to the r10 kernel at shift 0. */
class MinHashSampleSpec extends AnyFunSuite {

  private def sig(s: String, k: Int, n: Int, shift: Int): Seq[Long] = {
    val a = MinHashSignature.compute(UTF8String.fromString(s), k, n, shift)
    if (a == null) null else a.toLongArray().toSeq
  }

  /** Reference: fold only the windows with (h1 & mask) == 0. */
  private def expected(s: String, k: Int, n: Int, shift: Int): Option[Seq[Long]] = {
    val bytes = UTF8String.fromString(s).getBytes
    val windows = bytes.length - k + 1
    if (windows <= 0) return None
    val mask = (1L << shift) - 1L
    val M = 1L << 45
    val out = Array.fill(n)(Long.MaxValue)
    var any = false
    for (i <- 0 until windows) {
      val h1 = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, k, 42L)
      if ((h1 & mask) == 0L) {
        any = true
        val h2 = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, k, 1337L)
        val a = h1 & (M - 1)
        val b = (h2 & (M - 1)) | 1L
        for (j <- 0 until n) {
          val h = (a + j * b) & (M - 1)
          if (h < out(j)) out(j) = h
        }
      }
    }
    if (!any) None else Some(out.toSeq)
  }

  test("shift 0 is the identity (r10 kernel unchanged)") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "abcdefghij", "aaaaaaaaaaaaaaaa")
    texts.foreach { t =>
      assert(sig(t, 5, 48, 0) == sig(t, 5, 48, 0))
      assert(sig(t, 5, 48, 0) == expected(t, 5, 48, 0).get)
    }
  }

  test("sampled kernel ≡ full fold over the mask-passing windows") {
    val texts = (0 until 50).map(i =>
      s"document number $i with some shared boilerplate text and a tail ${i * 31}")
    for (t <- texts; shift <- Seq(1, 2, 4)) {
      expected(t, 5, 32, shift) match {
        case Some(e) => assert(sig(t, 5, 32, shift) == e, s"shift=$shift '$t'")
        case None    => // covered by the fallback test below
      }
    }
  }

  test("equal texts give equal signatures at any shift; sampling is content-defined") {
    val a = "identical content for the pair"
    for (shift <- Seq(0, 2, 4))
      assert(sig(a, 5, 32, shift) == sig(a, 5, 32, shift))
    // a PREFIX shift of the text still samples the shared shingles (the
    // sample is keyed on window content, not position): the sampled
    // signatures of overlapping texts share slots exactly where the full
    // kernel's sampled subset does
    val base = "common body of text that both documents share entirely"
    val shifted = "xy " + base
    val e1 = expected(base, 5, 32, 2)
    val e2 = expected(shifted, 5, 32, 2)
    assert(e1.isDefined && e2.isDefined)
    assert(sig(base, 5, 32, 2) == e1.get && sig(shifted, 5, 32, 2) == e2.get)
  }

  test("short docs that miss the sample fall back to the full pass") {
    // find a short text whose (few) windows all fail a high mask
    val shift = 12
    val t = "abcdef"
    val exp = expected(t, 5, 32, shift)
    if (exp.isEmpty)
      assert(sig(t, 5, 32, shift) == sig(t, 5, 32, 0), "fallback must be the full kernel")
    else assert(sig(t, 5, 32, shift) == exp.get)
  }
}
