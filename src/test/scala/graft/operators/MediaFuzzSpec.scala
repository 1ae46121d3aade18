package graft.operators

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz hardening for the pure-JVM media parsers (r13): a curation
  * pipeline feeds these whatever the crawl produced, so on ARBITRARY
  * bytes — random garbage or bit-flipped valid containers — they must
  * quarantine (None), never throw, and always terminate. Deterministic
  * seed walk (the PropertySpec harness pattern; the scalatest-scalacheck
  * bridge isn't on the classpath). */
class MediaFuzzSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    val params = org.scalacheck.Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(1337L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val randomBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 600).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  private def validMp4(id: Long): Array[Byte] =
    Multimodal.encodeMp4(
      timescale = 600 + (id % 5).toInt * 200,
      durationTicks = 1000 + (id % 9000).toInt,
      width = 160 + (id % 8).toInt * 16,
      height = 120 + ((id / 8) % 8).toInt * 16,
      codec = Seq("avc1", "hev1", "vp09")((id % 3).toInt),
      nFrames = 24 + (id % 100).toInt,
      withAudio = id % 2 == 1,
      mdat = new Array[Byte](64 + (id % 50).toInt))

  private def validWav(id: Long): Array[Byte] =
    Multimodal.encodeWav(8000 + (id % 5).toInt * 2000, 1 + (id % 2).toInt,
      16, new Array[Byte]((64 + (id % 37).toInt) * (1 + (id % 2).toInt) * 2))

  /** A valid container with `flips` random byte mutations. */
  private def mutated(base: Array[Byte]): Gen[Array[Byte]] =
    for {
      nFlips <- Gen.chooseNum(1, 8)
      flips <- Gen.listOfN(nFlips, for {
        pos <- Gen.chooseNum(0, base.length - 1)
        b <- Gen.chooseNum(-128, 127).map(_.toByte)
      } yield (pos, b))
    } yield {
      val out = base.clone()
      flips.foreach { case (p, b) => out(p) = b }
      out
    }

  test("decodeMp4 never throws on random bytes") {
    forAll(randomBytes) { bytes =>
      Multimodal.decodeMp4(bytes) // Some or None — must not throw or hang
    }
  }

  test("decodeMp4 never throws on bit-flipped valid containers, and a " +
    "successful parse still reports sane ranges") {
    forAll(Gen.chooseNum(0L, 40L).flatMap(id => mutated(validMp4(id)))) { bytes =>
      Multimodal.decodeMp4(bytes).foreach { info =>
        // a parse that survives mutation must still be structurally sane:
        // the walk clamps sizes, so counts cannot go negative and the
        // fourcc is always 4 chars
        assert(info.nTracks >= 0 && info.nFrames >= 0 && info.mdatBytes >= 0)
        assert(info.codec.length == 4)
        assert(info.timescale > 0)
      }
    }
  }

  test("decodeMp4 never throws on truncations of a valid container") {
    val base = validMp4(7L)
    (0 until base.length by 7).foreach { cut =>
      Multimodal.decodeMp4(base.take(cut))
    }
  }

  test("decodeWav never throws on random bytes or bit-flipped WAVs") {
    forAll(randomBytes)(bytes => Multimodal.decodeWav(bytes))
    forAll(Gen.chooseNum(0L, 40L).flatMap(id => mutated(validWav(id)))) { bytes =>
      Multimodal.decodeWav(bytes).foreach { case (rate, ch, _, frames) =>
        assert(rate > 0 && ch > 0 && frames >= 0)
      }
    }
  }
}
