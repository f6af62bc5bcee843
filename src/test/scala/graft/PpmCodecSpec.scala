package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{PpmCodec, WavCodec}

/** The P6 and RIFF/WAV codecs behind the mm_* media ops — parser
  * correctness beyond what the oracle gate can see (it only exercises
  * well-formed payloads the encoders produced). */
class PpmCodecSpec extends AnyFunSuite {

  private def ppm(header: String, rgb: Array[Byte]): Array[Byte] =
    header.getBytes("US-ASCII") ++ rgb

  test("encode/decode round-trips pixels and dimensions") {
    val gray = Array.tabulate(32)(i => (i * 7 % 251).toByte)
    val img = PpmCodec.decode(PpmCodec.encode(gray, 16, 2))
    assert(img.w == 16 && img.h == 2)
    assert(img.rgb.length == 96)
    gray.zipWithIndex.foreach { case (g, i) =>
      assert(img.rgb(3 * i) == g && img.rgb(3 * i + 1) == g &&
        img.rgb(3 * i + 2) == g, s"pixel $i mangled")
    }
  }

  test("header parse tolerates comments and mixed whitespace (PNM spec)") {
    val rgb = Array.tabulate(6)(_.toByte)
    val img = PpmCodec.decode(ppm("P6\n# a comment\n 2\t# w\n1 255\n", rgb))
    assert(img.w == 2 && img.h == 1 && img.rgb.toSeq == rgb.toSeq)
  }

  test("malformed payloads throw instead of emitting garbage") {
    val rgb = Array.tabulate(6)(_.toByte)
    // bad magic
    intercept[IllegalArgumentException] {
      PpmCodec.decode(ppm("P5\n2 1\n255\n", rgb))
    }
    // truncated payload
    intercept[IllegalArgumentException] {
      PpmCodec.decode(ppm("P6\n2 1\n255\n", rgb.take(5)))
    }
    // unsupported maxval
    intercept[IllegalArgumentException] {
      PpmCodec.decode(ppm("P6\n2 1\n15\n", rgb))
    }
    // zero dimension
    intercept[IllegalArgumentException] {
      PpmCodec.decode(ppm("P6\n0 1\n255\n", Array.empty[Byte]))
    }
    // w*h*3 overflowing Int must be rejected, not wrap past the
    // payload-length check (16777216 * 256 * 3 = 3 * 2^32 ≡ 0 mod 2^32)
    intercept[IllegalArgumentException] {
      PpmCodec.decode(ppm("P6\n16777216 256\n255\n", Array.empty[Byte]))
    }
  }

  test("wav: encode/decode round-trips samples and rate") {
    val samples = Array.tabulate(100)(i => (i * 13 % 251).toByte)
    val audio = WavCodec.decode(WavCodec.encode(samples, 8000))
    assert(audio.sampleRate == 8000)
    assert(audio.samples.toSeq == samples.toSeq)
  }

  test("wav: parser walks and skips unknown RIFF chunks") {
    // splice a LIST chunk (odd size -> exercises the pad byte) between
    // fmt and data, as real recorders emit
    val wav = WavCodec.encode(Array[Byte](1, 2, 3, 4), 8000)
    val fmtEnd = 12 + 8 + 16
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](9, 9, 9, 0) // 3 + pad
    val spliced = wav.take(fmtEnd) ++ junk ++ wav.drop(fmtEnd)
    // fix the RIFF size for the inserted bytes
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte
    spliced(5) = ((total >> 8) & 0xff).toByte
    val audio = WavCodec.decode(spliced)
    assert(audio.samples.toSeq == Seq[Byte](1, 2, 3, 4))
  }

  test("wav: malformed payloads throw") {
    val wav = WavCodec.encode(Array[Byte](1, 2, 3, 4))
    // bad magic
    intercept[IllegalArgumentException] {
      WavCodec.decode("JUNK".getBytes("US-ASCII") ++ wav.drop(4))
    }
    // data chunk overrunning the RIFF body
    val truncated = wav.take(wav.length - 2)
    intercept[IllegalArgumentException] { WavCodec.decode(truncated) }
    // stereo rejected (flip channel count in fmt at offset 12+8+2)
    val stereo = wav.clone(); stereo(22) = 2
    intercept[IllegalArgumentException] { WavCodec.decode(stereo) }
  }
}
