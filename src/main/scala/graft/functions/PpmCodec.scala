package graft.functions

/** Minimal pure-JVM binary-PPM (P6) codec — the real media decode behind
  * the `mm_*` pipeline (this container has no image libraries, so the
  * codec is implemented, not imported: P6 is a genuine interchange format
  * with a header parse, maxval validation, and a raw RGB payload).
  *
  * The decode is an honest parser: magic check, whitespace- and
  * comment-tolerant header tokenization (`#` comments are part of the PNM
  * spec), bounds-checked dimensions, payload-length validation. Anything
  * malformed throws — a media pipeline must fail loudly on a corrupt
  * payload, not emit garbage features.
  */
object PpmCodec {

  final case class Image(w: Int, h: Int, rgb: Array[Byte])

  /** Encode grayscale pixels (row-major, w·h bytes) as P6 by replicating
    * each sample into R=G=B. */
  def encode(gray: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h,
      s"bad dimensions: $w x $h for ${gray.length} samples")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < gray.length) {
      val o = header.length + i * 3
      out(o) = gray(i); out(o + 1) = gray(i); out(o + 2) = gray(i)
      i += 1
    }
    out
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f'

  /** Parse one whitespace-delimited unsigned decimal token starting at
    * `pos`, skipping leading whitespace and `#`-to-end-of-line comments.
    * Returns (value, next position). */
  private def token(bytes: Array[Byte], pos: Int): (Int, Int) = {
    var p = pos
    var done = false
    while (!done) {
      while (p < bytes.length && isSpace(bytes(p))) p += 1
      if (p < bytes.length && bytes(p) == '#')
        while (p < bytes.length && bytes(p) != '\n') p += 1
      else done = true
    }
    require(p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9',
      s"PPM: expected digit at offset $p")
    var v = 0
    while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
      v = v * 10 + (bytes(p) - '0')
      require(v <= (1 << 24), "PPM: header value out of range")
      p += 1
    }
    (v, p)
  }

  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "PPM: bad magic (want P6)")
    val (w, p1) = token(bytes, 2)
    val (h, p2) = token(bytes, p1)
    val (maxval, p3) = token(bytes, p2)
    require(w > 0 && h > 0, s"PPM: bad dimensions $w x $h")
    require(maxval == 255, s"PPM: unsupported maxval $maxval (want 255)")
    // exactly ONE whitespace byte separates the header from the payload
    require(p3 < bytes.length && isSpace(bytes(p3)),
      "PPM: missing header/payload separator")
    val start = p3 + 1
    // validate in LONG: w and h are individually capped at 2^24 but
    // w·h·3 can overflow Int, and a wrapped product would let a crafted
    // header pass the length check with a short payload
    val want = w.toLong * h * 3
    require(want <= Int.MaxValue, s"PPM: image too large ($w x $h)")
    require(bytes.length - start == want,
      s"PPM: payload ${bytes.length - start} bytes, want $want")
    Image(w, h, java.util.Arrays.copyOfRange(bytes, start, bytes.length))
  }

  /** Total decode for the 100 TB reality where some blob is always
    * malformed: any parse failure (truncation, bad magic, short payload,
    * crafted header) becomes None instead of an exception — so an
    * operator can fail PER-ROW (null + counted) rather than letting one
    * corrupt payload kill the task. [[decode]] keeps the fail-loud
    * contract for callers that constructed the payload themselves. */
  def decodeOpt(bytes: Array[Byte]): Option[Image] =
    try Some(decode(bytes))
    catch { case scala.util.control.NonFatal(_) => None }
}
