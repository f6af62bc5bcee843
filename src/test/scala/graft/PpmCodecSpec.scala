package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PpmCodec

/** The P6 codec behind the mm_* image ops — parser correctness beyond
  * what the oracle gate can see (it only exercises well-formed payloads
  * the encoder produced). */
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
  }
}
