package graft.functions

/** Minimal pure-JVM RIFF/WAVE codec for 8-bit unsigned mono PCM — the
  * real audio decode behind `mm_audio_features` (no audio libraries in
  * this container, so the codec is implemented, not imported).
  *
  * The decode is an honest RIFF parser: validates the RIFF/WAVE magic,
  * WALKS the chunk list (skipping unknown chunks by their declared size,
  * as the format requires — real WAV files carry LIST/INFO/fact chunks),
  * validates the fmt chunk (PCM, mono, 8-bit), and bounds-checks the
  * data chunk. Malformed input throws — same fail-loud contract as
  * `PpmCodec`.
  */
object WavCodec {

  final case class Audio(sampleRate: Int, samples: Array[Byte])

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  def encode(samples: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    require(samples.nonEmpty, "empty sample buffer")
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(sampleRate) ++ le32(sampleRate) ++
      le16(1) ++ le16(8)
    // RIFF chunks are word-aligned: an odd-size data chunk carries one
    // trailing pad byte (not counted in the declared size) — omitting it
    // would make a spec-conforming consumer's `size + (size & 1)` walk
    // read past the RIFF body
    val pad = if ((samples.length & 1) == 1) Array(0.toByte)
      else Array.empty[Byte]
    val data = "data".getBytes("US-ASCII") ++ le32(samples.length) ++
      samples ++ pad
    val riffBody = "WAVE".getBytes("US-ASCII") ++ fmt ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(riffBody.length) ++ riffBody
  }

  private def readLe32(b: Array[Byte], p: Int): Int = {
    require(p + 4 <= b.length, s"WAV: truncated at offset $p")
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  }

  private def readLe16(b: Array[Byte], p: Int): Int = {
    require(p + 2 <= b.length, s"WAV: truncated at offset $p")
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  }

  private def tag(b: Array[Byte], p: Int): String = {
    require(p + 4 <= b.length, s"WAV: truncated at offset $p")
    new String(b, p, 4, "US-ASCII")
  }

  def decode(bytes: Array[Byte]): Audio = {
    require(tag(bytes, 0) == "RIFF", "WAV: bad RIFF magic")
    val riffLen = readLe32(bytes, 4)
    // compare in LONG: a near-Int.MaxValue declared size would wrap
    // `8 + riffLen` negative and slip past a signed int comparison
    require(riffLen >= 4 && 8L + riffLen <= bytes.length,
      "WAV: RIFF size out of bounds")
    require(tag(bytes, 8) == "WAVE", "WAV: not a WAVE form")
    var p = 12
    var sampleRate = -1
    var samples: Array[Byte] = null
    while (p + 8L <= 8L + riffLen) {
      val id = tag(bytes, p)
      val size = readLe32(bytes, p + 4)
      require(size >= 0 && p + 8L + size <= 8L + riffLen,
        s"WAV: chunk '$id' overruns the RIFF body")
      id match {
        case "fmt " =>
          require(size >= 16, "WAV: fmt chunk too small")
          require(readLe16(bytes, p + 8) == 1, "WAV: not PCM")
          require(readLe16(bytes, p + 10) == 1, "WAV: not mono")
          sampleRate = readLe32(bytes, p + 12)
          require(sampleRate > 0, "WAV: bad sample rate")
          require(readLe16(bytes, p + 22) == 8, "WAV: not 8-bit")
        case "data" =>
          require(sampleRate > 0, "WAV: data chunk before fmt")
          samples = java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + size)
        case _ => // unknown chunk: skip by declared size (RIFF contract)
      }
      p += 8 + size + (size & 1) // chunks are word-aligned, pad byte
    }
    require(samples != null, "WAV: no data chunk")
    Audio(sampleRate, samples)
  }

  /** Total decode for the 100 TB reality where some blob is always
    * malformed: any parse failure (truncation, bad magic, overrunning
    * chunk, wrong format) becomes None instead of an exception — so an
    * operator can fail PER-ROW (null + counted) rather than letting one
    * corrupt payload kill the task. [[decode]] keeps the fail-loud
    * contract for callers that constructed the payload themselves. */
  def decodeOpt(bytes: Array[Byte]): Option[Audio] =
    try Some(decode(bytes))
    catch { case scala.util.control.NonFatal(_) => None }
}
