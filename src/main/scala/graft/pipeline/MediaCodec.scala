package graft.pipeline

/** REAL pure-JVM media decoders — binary PPM (P6) / PGM (P5) / PBM (P4), BMP
  * (24/32bpp + 8bpp palette), PNG (full non-interlaced 8-bit profile),
  * GIF (general LZW), and baseline JPEG (Huffman + IDCT, general
  * subsampling) images; RIFF/WAV 8/16-bit mono/stereo PCM audio; and
  * YUV4MPEG2 C444/C422/C420 video — so the multimodal decode path is
  * exercised against genuine media bytes, not only the deterministic
  * stub. No codec libraries exist in this environment; each format is
  * decoded from the spec in plain byte arithmetic (the compressed ones
  * via `java.util.zip.Inflater`, a from-scratch LZW machine, and a
  * from-scratch Huffman+IDCT entropy pipeline respectively).
  *
  * The decoders are strict about what they accept (exact magic, 24bpp,
  * uncompressed, positive dimensions, enough pixel bytes) and throw
  * `IllegalArgumentException` with a reason otherwise — a production codec
  * dispatch wants loud rejects, not best-effort garbage. Callers that want
  * fallback behavior sniff first ([[MediaCodec.sniff]]).
  *
  * Reference behavior anchor: the reference pipeline treats media as opaque
  * payloads and never decodes (hadoop-pyspark-streaming-analytics has no
  * media path at all); this surface comes from the builder brief's
  * multimodal requirement, with the formats chosen so the contract is
  * testable inside the sandbox.
  */
object MediaCodec {

  /** A decoded raster: row-major pixels, 3 channels, 8 bits per sample.
    * `rgb` has length `width * height * 3`, ordered R,G,B per pixel.
    */
  final case class RasterImage(width: Int, height: Int, rgb: Array[Byte]) {
    def pixelCount: Int = width * height

    /** Sum of R+G+B for pixel `i` (row-major) — exact integer. */
    def rgbSum(i: Int): Int =
      (rgb(3 * i) & 0xff) + (rgb(3 * i + 1) & 0xff) + (rgb(3 * i + 2) & 0xff)
  }

  /** Decoded PCM audio, channel-merged to mono. `bits` records the source
    * sample depth; `samples` holds the raw values in that depth's native
    * domain — unsigned 0..255 for 8-bit, signed -32768..32767 for 16-bit,
    * signed -8388608..8388607 for 24-bit (all little-endian on the wire,
    * per spec). IEEE float32 sources (fmt tag 3, `bits` recorded as 32)
    * arrive quantized by the decoder to the 16-bit integer grid — exact
    * `trunc(f * 32768)` clamped to [-32768, 32767], see [[decodeWav]] —
    * so every depth downstream is integer-exact. Stereo sources arrive
    * already downmixed by the decoder (exact integer floor mean).
    */
  final case class PcmAudio(sampleRate: Int, bits: Int, samples: Array[Int]) {
    /** Amplitude around the depth's zero line: |s - 128| for unsigned
      * 8-bit, |s| for the signed depths — exact integers either way.
      */
    def amplitude(i: Int): Int =
      if (bits == 8) math.abs(samples(i) - 128) else math.abs(samples(i))

    /** Full-scale amplitude for the depth (the featurizer denominator).
      * Float32 (`bits` = 32) uses the 16-bit scale its samples were
      * quantized onto.
      */
    def fullScale: Double = bits match {
      case 8  => 128.0
      case 24 => 8388608.0
      case _  => 32768.0 // 16-bit PCM and 16-bit-quantized float32
    }
  }

  object PcmAudio {
    /** 8-bit convenience constructor (raw unsigned sample bytes). */
    def apply(sampleRate: Int, samples: Array[Byte]): PcmAudio =
      PcmAudio(sampleRate, 8, samples.map(_ & 0xff))
  }

  /** Magic-byte sniff: Some("ppm") for binary P6, Some("pgm") for binary
    * P5, Some("bmp") for BM, Some("gif") for GIF87a/89a, Some("wav") for
    * RIFF, Some("y4m") for YUV4MPEG2, None for anything else (callers
    * fall back to the stub featurizer).
    */
  def sniff(payload: Array[Byte]): Option[String] =
    if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6') Some("ppm")
    else if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '5') Some("pgm")
    else if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '4') Some("pbm")
    else if (payload.length >= 4 && (payload(0) & 0xff) == 0x89 &&
      payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G') Some("png")
    else if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') Some("bmp")
    else if (payload.length >= 6 && payload(0) == 'G' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == '8' &&
      (payload(4) == '7' || payload(4) == '9') && payload(5) == 'a') Some("gif")
    else if (payload.length >= 3 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0xd8 && (payload(2) & 0xff) == 0xff) Some("jpeg")
    else if (payload.length >= 4 && payload(0) == 'R' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == 'F') Some("wav")
    else if (payload.length >= 9 &&
      new String(payload, 0, 9, "US-ASCII") == "YUV4MPEG2") Some("y4m")
    else None

  /** Decode a payload whose magic bytes sniff as a supported raster. */
  def decode(payload: Array[Byte]): RasterImage = sniff(payload) match {
    case Some("ppm") => decodePpm(payload)
    case Some("pgm") => decodePgm(payload)
    case Some("pbm") => decodePbm(payload)
    case Some("png") => decodePng(payload)
    case Some("bmp") => decodeBmp(payload)
    case Some("gif") => decodeGif(payload)
    case Some("jpeg") => decodeJpeg(payload)
    case _ => throw new IllegalArgumentException("unsupported raster payload")
  }

  /** Binary PPM (P6): `P6 <ws> width <ws> height <ws> maxval <single-ws>`
    * then `width*height*3` RGB samples — ONE byte each for maxval ≤ 255
    * (kept RAW, the identity at the canonical 255 — the historical
    * contract every existing oracle pins), TWO bytes each, most
    * significant first, for maxval 256..65535 (per spec), normalized to
    * 8-bit with the pinned truncating map `v * 255 / maxval` (exact
    * integer arithmetic, engine-reproducible; at maxval 65535 = 257·255
    * the map inverts `v8 * 257` exactly, property-tested). `#` comments
    * are legal anywhere whitespace is. A sample above maxval is a strict
    * reject — this decoder verifies, it never clamps.
    */
  def decodePpm(bytes: Array[Byte]): RasterImage = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 PPM")
    decodeNetpbm(bytes, channels = 3)
  }

  /** Binary PGM (P5): the GRAYSCALE Netpbm sibling — same header grammar
    * as [[decodePpm]] but `width*height` single-channel samples (1 byte
    * for maxval ≤ 255, 2 bytes MSB-first up to 65535, same pinned
    * truncating normalization). Decodes to the standard [[RasterImage]]
    * contract by replicating each gray sample to R=G=B — so every
    * downstream consumer (banded luma, aHash, resize, thumbnails) works
    * unchanged, and a gray pixel's `rgbSum` is exactly `3*g`.
    */
  def decodePgm(bytes: Array[Byte]): RasterImage = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '5', "not a P5 PGM")
    decodeNetpbm(bytes, channels = 1)
  }

  /** Binary PBM (P4): the 1-BIT Netpbm sibling — same header grammar
    * minus maxval, then row-major PACKED bits, each row padded to a byte
    * boundary (pad bits ignored), MSB first; per the spec a 1 bit is
    * BLACK (0) and a 0 bit is WHITE (255), replicated to R=G=B like PGM.
    */
  def decodePbm(bytes: Array[Byte]): RasterImage = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '4', "not a P4 PBM")
    var pos = 2
    def skipWsAndComments(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (pos < bytes.length && Character.isWhitespace(bytes(pos))) { pos += 1; moved = true }
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          moved = true
        }
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
        s"PBM header: expected digit at byte $pos")
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
        require(v <= Int.MaxValue, s"PBM header: number too large at byte $pos")
      }
      v.toInt
    }
    val width = readInt()
    val height = readInt()
    require(width > 0 && height > 0, s"PBM: bad dimensions ${width}x$height")
    require(pos < bytes.length && Character.isWhitespace(bytes(pos)), "PBM: missing pixel separator")
    pos += 1
    val rowBytes = (width + 7) / 8
    require(bytes.length - pos >= rowBytes.toLong * height,
      s"PBM: truncated bits (${bytes.length - pos} < ${rowBytes.toLong * height})")
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"PBM: image too large (${width}x$height)")
    val rgb = new Array[Byte](width * height * 3)
    var r = 0
    while (r < height) {
      var x = 0
      while (x < width) {
        val bit = (bytes(pos + r * rowBytes + (x >> 3)) >> (7 - (x & 7))) & 1
        val v: Byte = if (bit == 1) 0 else 255.toByte // 1 = black per spec
        val o = (r * width + x) * 3
        rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
        x += 1
      }
      r += 1
    }
    RasterImage(width, height, rgb)
  }

  private def decodeNetpbm(bytes: Array[Byte], channels: Int): RasterImage = {
    var pos = 2
    def skipWsAndComments(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (pos < bytes.length && Character.isWhitespace(bytes(pos))) { pos += 1; moved = true }
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          moved = true
        }
      }
    }
    def readInt(): Int = {
      skipWsAndComments()
      require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
        s"PPM header: expected digit at byte $pos")
      var v = 0L // Long accumulate: a 12-digit header number must reject, not wrap
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
        require(v <= Int.MaxValue, s"PPM header: number too large at byte $pos")
      }
      v.toInt
    }
    val width = readInt()
    val height = readInt()
    val maxval = readInt()
    require(width > 0 && height > 0, s"PPM: bad dimensions ${width}x$height")
    require(maxval > 0 && maxval <= 65535, s"PPM: unsupported maxval $maxval")
    val twoByte = maxval > 255
    // exactly ONE whitespace byte separates the header from pixel data
    require(pos < bytes.length && Character.isWhitespace(bytes(pos)), "PPM: missing pixel separator")
    pos += 1
    // Long math: a hostile header like `P6 65536 65536 255` must reject as
    // truncated, not wrap width*height*3 to a small Int and decode garbage
    val nL = width.toLong * height * channels
    val needL = nL * (if (twoByte) 2 else 1)
    require(bytes.length - pos >= needL, s"PPM: truncated pixels (${bytes.length - pos} < $needL)")
    // the RGB expansion buffer is w*h*3 regardless of channels: for 1-channel
    // PGM the needL guard alone admits w*h up to ~2^31/1, so pin the OUTPUT
    // size too — reject, never a wrapped negative allocation
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"PPM: image too large (${width}x$height)")
    val n = nL.toInt
    if (channels == 3 && !twoByte)
      RasterImage(width, height, java.util.Arrays.copyOfRange(bytes, pos, pos + n))
    else {
      // one normalized 8-bit value per SOURCE sample; gray replicates to RGB
      val out = new Array[Byte](width * height * 3)
      var i = 0
      while (i < n) {
        val v8: Byte =
          if (!twoByte) bytes(pos + i)
          else {
            val v = ((bytes(pos + 2 * i) & 0xff) << 8) | (bytes(pos + 2 * i + 1) & 0xff) // MSB first
            require(v <= maxval, s"PPM: sample $v exceeds maxval $maxval")
            (v * 255 / maxval).toByte // pinned truncating normalization
          }
        if (channels == 3) out(i) = v8
        else { out(3 * i) = v8; out(3 * i + 1) = v8; out(3 * i + 2) = v8 }
        i += 1
      }
      RasterImage(width, height, out)
    }
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) |
      ((b(off + 3) & 0xff) << 24)

  /** Uncompressed BMP (BITMAPINFOHEADER), the three uncompressed depths a
    * real landing dir actually contains: 24bpp B,G,R triples; 32bpp
    * B,G,R,A quads (BI_RGB's fourth byte is padding/alpha — ignored);
    * 8bpp palette-indexed (BGRA color table of `biClrUsed` entries — 0
    * means 256 per spec — right after the info header, each pixel byte an
    * index, out-of-palette indexes reject strictly). Layout: 14-byte file
    * header (magic `BM`, pixel-data offset at byte 10), 40+-byte DIB
    * header (width/height at 18/22, bpp at 28, compression at 30 must be
    * 0). Rows are 4-byte aligned, and a POSITIVE height means bottom-up
    * row order (the common case); negative height is top-down. Output is
    * normalized to row-major top-down RGB.
    */
  def decodeBmp(bytes: Array[Byte]): RasterImage = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val pixelOffset = le32(bytes, 10)
    val infoSize = le32(bytes, 14)
    val width = le32(bytes, 18)
    val rawHeight = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    require(bpp == 8 || bpp == 24 || bpp == 32,
      s"BMP: only 8/24/32bpp supported, got $bpp")
    require(compression == 0 || (compression == 1 && bpp == 8),
      s"BMP: only BI_RGB and 8bpp BI_RLE8 supported, got compression $compression at $bpp bpp")
    require(infoSize >= 40, s"BMP: info header too short ($infoSize)")
    require(pixelOffset >= 54 && pixelOffset <= bytes.length,
      s"BMP: pixel-data offset $pixelOffset outside the file")
    // 8bpp is palette-indexed: BGRA quads right after the info header,
    // biClrUsed entries (0 means the full 256 per spec)
    val nColors = if (bpp == 8) {
      val c = le32(bytes, 46)
      if (c == 0) 256 else c
    } else 0
    val palOff = 14 + infoSize
    if (bpp == 8) {
      require(nColors > 0 && nColors <= 256, s"BMP: bad palette size $nColors")
      require(palOff + 4L * nColors <= pixelOffset,
        "BMP: palette does not fit before the pixel data")
    }
    val height = math.abs(rawHeight)
    val bottomUp = rawHeight > 0
    require(width > 0 && height > 0, s"BMP: bad dimensions ${width}x$rawHeight")
    // Long math: a hostile header's width*bytesPer or rowBytes*height must
    // reject, never overflow into a vacuously-true bounds check
    val rowBytesL = ((width.toLong * (bpp / 8) + 3) / 4) * 4
    // divide, don't multiply: rowBytesL * height can itself overflow Long
    // when both dims are near Int.MaxValue
    require(compression == 1 ||
      height <= (bytes.length - pixelOffset) / rowBytesL, "BMP: truncated pixels")
    val rowBytes = rowBytesL.toInt
    // BI_RLE8: decode the run stream into a top-down index raster first;
    // runs never cross rows, EOL (00 00) advances, EOB (00 01) ends,
    // literal runs (00 n>=3) pad to a word, the delta escape is a named
    // reject (it encodes SKIPPED pixels whose value is undefined)
    val rle: Array[Byte] = if (compression == 1) {
      require(bottomUp, "BMP: RLE8 requires a bottom-up bitmap")
      require(width.toLong * height <= Int.MaxValue, "BMP: RLE8 raster too large")
      val idx = new Array[Byte](width * height)
      var p = pixelOffset
      var x = 0
      var y = 0 // counts from the BOTTOM row, per file order
      var eob = false
      while (!eob) {
        require(p + 2 <= bytes.length, "BMP: truncated RLE8 stream")
        val n = bytes(p) & 0xff
        val v = bytes(p + 1) & 0xff
        p += 2
        if (n > 0) {
          require(y < height && x + n <= width, s"BMP: RLE8 run overflows row $y")
          val base = (height - 1 - y) * width
          var i = 0
          while (i < n) { idx(base + x) = v.toByte; x += 1; i += 1 }
        } else v match {
          case 0 => x = 0; y += 1 // end of line
          case 1 => eob = true
          case 2 => throw new IllegalArgumentException("BMP: RLE8 delta escape unsupported")
          case lit =>
            require(y < height && x + lit <= width, s"BMP: RLE8 literal overflows row $y")
            require(p + lit + (lit & 1) <= bytes.length, "BMP: truncated RLE8 literal")
            val base = (height - 1 - y) * width
            var i = 0
            while (i < lit) { idx(base + x) = bytes(p + i); x += 1; i += 1 }
            p += lit + (lit & 1) // literal runs pad to a word boundary
        }
      }
      idx
    } else null
    val rgb = new Array[Byte](width * height * 3)
    var row = 0
    while (row < height) {
      val srcRow = if (bottomUp) height - 1 - row else row
      val src = pixelOffset + srcRow * rowBytes
      var x = 0
      while (x < width) {
        val d = 3 * (row * width + x)
        bpp match {
          case 24 =>
            rgb(d) = bytes(src + 3 * x + 2)     // R
            rgb(d + 1) = bytes(src + 3 * x + 1) // G
            rgb(d + 2) = bytes(src + 3 * x)     // B
          case 32 => // BGRA quads; the A/reserved byte is ignored per BI_RGB
            rgb(d) = bytes(src + 4 * x + 2)
            rgb(d + 1) = bytes(src + 4 * x + 1)
            rgb(d + 2) = bytes(src + 4 * x)
          case _ => // 8bpp: index into the BGRA palette
            val idx = (if (rle != null) rle(row * width + x) else bytes(src + x)) & 0xff
            require(idx < nColors, s"BMP: palette index $idx >= biClrUsed $nColors")
            val p = palOff + 4 * idx
            rgb(d) = bytes(p + 2)
            rgb(d + 1) = bytes(p + 1)
            rgb(d + 2) = bytes(p)
        }
        x += 1
      }
      row += 1
    }
    RasterImage(width, height, rgb)
  }

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** PNG — THE format a real image corpus actually lands as. Full decode
    * of the non-interlaced 8-bit-per-sample profile in pure JVM:
    * signature + chunk walk with CRC-32 VERIFIED on every chunk (a
    * corrupted or hand-faked file rejects, it never decodes to garbage),
    * IHDR geometry/profile checks, PLTE capture, IDAT concatenation
    * across chunks, zlib inflation via `java.util.zip.Inflater` (any
    * conformant stream: dynamic/fixed/stored blocks alike), and per-row
    * UNFILTERING of all five spec filters (None/Sub/Up/Average/Paeth —
    * Paeth with the spec's exact tie-break order). Color types 0 (gray,
    * replicated to R=G=B like PGM), 2 (RGB), 3 (palette-indexed, PLTE
    * required and indexes bounds-checked), and 6 (RGBA, alpha dropped —
    * the library's raster model is RGB) are supported at bit depth 8;
    * depth 16 decodes for gray and RGB (MSB-first samples, filters
    * striding the 2-byte-per-sample pixel width, normalized v·255/65535 =
    * v/257 exactly — the scientific/archival profile); 1/2/4-bit,
    * gray+alpha, 16-bit palette/RGBA, and broken-Adler profiles reject
    * strictly. BOTH interlace
    * methods decode: Adam7 is the 7-pass generalization of the same
    * unfilter (each pass filters against its own previous row, empty
    * passes contribute no bytes, pixels scatter to (x0+i·dx, y0+r·dy)),
    * and non-interlaced is its 1-pass special case. Output is
    * row-major top-down RGB, same as every other raster decoder.
    */
  def decodePng(bytes: Array[Byte]): RasterImage = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    require(bytes.length >= 8 + 25 && (0 until 8).forall(i => bytes(i) == sig(i)),
      "not a PNG")
    var pos = 8
    var width = -1; var height = -1; var colorType = -1; var depth = -1
    var interlaced = false
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(pos + 8 <= bytes.length, "PNG: truncated chunk header")
      val len = be32(bytes, pos)
      require(len >= 0, s"PNG: negative chunk length at byte $pos")
      val body = pos + 8
      require(body + len.toLong + 4 <= bytes.length, "PNG: truncated chunk")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == be32(bytes, body + len),
        s"PNG: CRC mismatch in $typ chunk")
      typ match {
        case "IHDR" =>
          require(len == 13, s"PNG: IHDR must be 13 bytes, got $len")
          width = be32(bytes, body)
          height = be32(bytes, body + 4)
          require(width > 0 && height > 0, s"PNG: bad dimensions ${width}x$height")
          depth = bytes(body + 8) & 0xff
          colorType = bytes(body + 9) & 0xff
          require(colorType == 0 || colorType == 2 || colorType == 3 || colorType == 6,
            s"PNG: only color types 0/2/3/6 supported, got $colorType")
          // 16-bit (r12): gray and RGB — the scientific/archival profiles;
          // 16-bit palette does not exist in the spec and 16-bit RGBA stays
          // out of scope with the other alpha-bearing rarities
          require(depth == 8 || (depth == 16 && (colorType == 0 || colorType == 2)),
            s"PNG: bit depth $depth unsupported for color type $colorType")
          require(bytes(body + 10) == 0 && bytes(body + 11) == 0,
            "PNG: nonstandard compression/filter method")
          interlaced = (bytes(body + 12) & 0xff) == 1
          require(bytes(body + 12) == 0 || interlaced,
            s"PNG: bad interlace method ${bytes(body + 12)}")
        case "PLTE" =>
          require(len % 3 == 0 && len <= 768, s"PNG: bad PLTE length $len")
          palette = java.util.Arrays.copyOfRange(bytes, body, body + len)
        case "IDAT" => idat.write(bytes, body, len)
        case "IEND" => done = true
        case _ => // ancillary chunk (tEXt, pHYs, gAMA...): CRC checked, skipped
      }
      pos = body + len + 4
    }
    require(width > 0, "PNG: missing IHDR")
    val channels = colorType match { case 2 => 3; case 6 => 4; case _ => 1 }
    // bytes per pixel: the filter's "left/upper-left" offset is in BYTES
    // (PNG spec: filters operate bytewise at the pixel stride), so every
    // row-walk below strides bpp, not channels
    val bpp = channels * (depth / 8)
    // Long math on hostile IHDR dims (the same guard every sibling decoder
    // carries): 65536×65536 RGBA must hit THIS reject, not wrap the raw /
    // rgb allocation sizes negative
    require((width.toLong * bpp + 1) * height <= Int.MaxValue &&
      width.toLong * height * 3 <= Int.MaxValue,
      s"PNG: image too large (${width}x$height, color type $colorType)")
    // Adam7 reduces to pass lists; non-interlaced is the 1-pass case.
    // Empty passes (a dimension rounds to 0) contribute NO bytes at all.
    val passes: Seq[(Int, Int, Int, Int, Int, Int)] =
      (if (!interlaced) Seq((0, 0, 1, 1))
       else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
         (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)))
        .map { case (x0, y0, dx, dy) =>
          val pw = if (width > x0) (width - x0 + dx - 1) / dx else 0
          val ph = if (height > y0) (height - y0 + dy - 1) / dy else 0
          (x0, y0, dx, dy, pw, ph)
        }
        .filter(p => p._5 > 0 && p._6 > 0)
    val totalRaw = passes.map(p => p._6.toLong * (p._5.toLong * bpp + 1)).sum
    require(totalRaw <= Int.MaxValue, "PNG: interlaced pixel stream too large")
    val raw = new Array[Byte](totalRaw.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var off = 0
      var step = -1
      while (off < raw.length && step != 0) {
        step = inf.inflate(raw, off, raw.length - off)
        off += step
      }
      require(off == raw.length,
        s"PNG: pixel stream is $off bytes, expected ${raw.length}")
      // a conformant stream ends exactly here; trailing pixels mean the
      // IHDR geometry and the IDAT contents disagree
      require(inf.finished || inf.inflate(new Array[Byte](1)) == 0,
        "PNG: pixel stream longer than the IHDR geometry")
    } catch { case e: java.util.zip.DataFormatException =>
      throw new IllegalArgumentException(s"PNG: corrupt zlib stream: ${e.getMessage}")
    } finally inf.end()
    // per pass: unfilter in place (each filter references the PRIOR
    // reconstructed row OF THE SAME PASS), then scatter the pass's pixels
    // to their final (x0 + i·dx, y0 + r·dy) positions
    val out = new Array[Byte](width * height * bpp)
    var passBase = 0
    passes.foreach { case (x0, y0, dx, dy, pw, ph) =>
      val rowLen = pw * bpp
      var r = 0
      while (r < ph) {
        val base = passBase + r * (rowLen + 1)
        val filter = raw(base) & 0xff
        var i = 0
        while (i < rowLen) {
          val x = raw(base + 1 + i) & 0xff
          val a = if (i >= bpp) raw(base + 1 + i - bpp) & 0xff else 0 // left
          val b = if (r > 0) raw(base - rowLen + i) & 0xff else 0 // up
          val c = if (r > 0 && i >= bpp) raw(base - rowLen + i - bpp) & 0xff else 0
          val recon = filter match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + (a + b) / 2
            case 4 => // Paeth: nearest of a/b/c to p = a + b - c, ties a, then b
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case f => throw new IllegalArgumentException(s"PNG: bad filter type $f in row $r")
          }
          raw(base + 1 + i) = (recon & 0xff).toByte
          i += 1
        }
        var px = 0
        while (px < pw) {
          val dst = ((y0 + r * dy) * width + (x0 + px * dx)) * bpp
          var ch = 0
          while (ch < bpp) {
            out(dst + ch) = raw(base + 1 + px * bpp + ch)
            ch += 1
          }
          px += 1
        }
        r += 1
      }
      passBase += ph * (rowLen + 1)
    }
    val rgb = new Array[Byte](width * height * 3)
    var p = 0
    val n = width * height
    // 16-bit samples (MSB first per spec) normalize to the 8-bit raster
    // with the library's pinned truncating map v*255/65535 — exactly v/257
    // since 65535 = 257·255, the same identity mm_real_decode16 pins for
    // 16-bit PPM
    def s16(off: Int): Byte =
      ((((out(off) & 0xff) << 8) | (out(off + 1) & 0xff)) / 257).toByte
    while (p < n) {
      val src = p * bpp
      colorType match {
        case 2 | 6 if depth == 8 =>
          rgb(3 * p) = out(src); rgb(3 * p + 1) = out(src + 1); rgb(3 * p + 2) = out(src + 2)
        case 2 =>
          rgb(3 * p) = s16(src); rgb(3 * p + 1) = s16(src + 2); rgb(3 * p + 2) = s16(src + 4)
        case 0 if depth == 8 =>
          rgb(3 * p) = out(src); rgb(3 * p + 1) = out(src); rgb(3 * p + 2) = out(src)
        case 0 =>
          val g = s16(src)
          rgb(3 * p) = g; rgb(3 * p + 1) = g; rgb(3 * p + 2) = g
        case _ =>
          require(palette != null, "PNG: palette image without a PLTE chunk")
          val idx = out(src) & 0xff
          require(3 * idx + 2 < palette.length,
            s"PNG: palette index $idx beyond the ${palette.length / 3}-entry PLTE")
          rgb(3 * p) = palette(3 * idx)
          rgb(3 * p + 1) = palette(3 * idx + 1)
          rgb(3 * p + 2) = palette(3 * idx + 2)
      }
      p += 1
    }
    RasterImage(width, height, rgb)
  }

  /** GIF87a/89a, still-image profile: header + logical screen descriptor,
    * global or local color table, extension blocks skipped by their
    * sub-block framing (GCE transparency deliberately ignored — this
    * decoder rasterizes, it doesn't composite), then the FIRST image
    * descriptor's data through full general LZW ([[lzwDecode]]: variable
    * 3–12-bit codes, LSB-first bit packing, clear / end-of-information,
    * KwKwK self-reference, deferred clear at a full dictionary), the
    * four-pass interlace row remap when flagged (ImageIO's own writer
    * emits interlaced by default — GifSpec round-trips it), and the
    * palette map. Named-reject scope cut: frames smaller than the logical
    * screen (animation deltas need compositing state, not decoding).
    * Long-math guards on hostile dimensions like every sibling decoder.
    */
  def decodeGif(bytes: Array[Byte]): RasterImage = {
    require(bytes.length >= 14 &&
      new String(bytes, 0, 6, "US-ASCII").matches("GIF8[79]a"), "not a GIF")
    val width = le16(bytes, 6)
    val height = le16(bytes, 8)
    require(width > 0 && height > 0, s"GIF: bad dimensions ${width}x$height")
    require(width.toLong * height * 3 <= Int.MaxValue,
      s"GIF: image too large (${width}x$height)")
    val packed = bytes(10) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 3 * (1 << ((packed & 7) + 1))
      require(pos + n <= bytes.length, "GIF: truncated global color table")
      gct = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
    }
    while (true) {
      require(pos < bytes.length, "GIF: stream ends without a trailer")
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label byte then sub-blocks to a 0 terminator
          pos += 2
          require(pos <= bytes.length, "GIF: truncated extension")
          var b = -1
          while ({ require(pos < bytes.length, "GIF: truncated extension")
                   b = bytes(pos) & 0xff; pos += 1; b != 0 }) {
            require(pos + b <= bytes.length, "GIF: truncated extension sub-block")
            pos += b
          }
        case 0x2C => // image descriptor
          require(pos + 10 <= bytes.length, "GIF: truncated image descriptor")
          val left = le16(bytes, pos + 1); val top = le16(bytes, pos + 3)
          val iw = le16(bytes, pos + 5); val ih = le16(bytes, pos + 7)
          val ipacked = bytes(pos + 9) & 0xff
          require(left == 0 && top == 0 && iw == width && ih == height,
            "GIF: sub-rectangle frames (animation deltas) not supported")
          val interlaced = (ipacked & 0x40) != 0
          pos += 10
          var ct = gct
          if ((ipacked & 0x80) != 0) {
            val n = 3 * (1 << ((ipacked & 7) + 1))
            require(pos + n <= bytes.length, "GIF: truncated local color table")
            ct = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
            pos += n
          }
          require(ct != null, "GIF: image without a color table")
          require(pos < bytes.length, "GIF: missing LZW minimum code size")
          val mcs = bytes(pos) & 0xff
          require(mcs >= 2 && mcs <= 8, s"GIF: bad LZW minimum code size $mcs")
          pos += 1
          val data = new java.io.ByteArrayOutputStream()
          var b = -1
          while ({ require(pos < bytes.length, "GIF: truncated image data")
                   b = bytes(pos) & 0xff; pos += 1; b != 0 }) {
            require(pos + b <= bytes.length, "GIF: truncated image sub-block")
            data.write(bytes, pos, b); pos += b
          }
          val seq = lzwDecode(data.toByteArray, mcs, width * height)
          // interlaced streams carry rows in the four-pass order
          // 0,8,16… / 4,12… / 2,6,10… / 1,3,5… — remap to display order
          val idx =
            if (!interlaced) seq
            else {
              val order = (0 until height by 8) ++ (4 until height by 8) ++
                (2 until height by 4) ++ (1 until height by 2)
              val d = new Array[Byte](seq.length)
              var s = 0
              while (s < height) {
                System.arraycopy(seq, s * width, d, order(s) * width, width)
                s += 1
              }
              d
            }
          val rgb = new Array[Byte](width * height * 3)
          var p = 0
          while (p < idx.length) {
            val i = idx(p) & 0xff
            require(3 * i + 2 < ct.length,
              s"GIF: pixel index $i beyond the ${ct.length / 3}-entry color table")
            rgb(3 * p) = ct(3 * i); rgb(3 * p + 1) = ct(3 * i + 1)
            rgb(3 * p + 2) = ct(3 * i + 2)
            p += 1
          }
          return RasterImage(width, height, rgb)
        case 0x3B =>
          throw new IllegalArgumentException("GIF: trailer before any image")
        case other =>
          throw new IllegalArgumentException("GIF: unknown block 0x%02X".format(other))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** General GIF-variant LZW: codes start at minCodeSize+1 bits and grow
    * to 12 as the dictionary fills (one increment each time the size
    * reaches 2^width), LSB-first packing, `clear` resets the table,
    * `end` terminates — which must land on exactly `expected` output
    * bytes. The dictionary is the standard prefix/suffix pair of arrays;
    * expansion walks the chain backwards into a reusable buffer.
    */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int, expected: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val chain = new Array[Byte](4096)
    val out = new Array[Byte](expected)
    var outPos = 0
    var dictSize = clear + 2
    var codeWidth = minCodeSize + 1
    var prev = -1
    var bitPos = 0L
    val totalBits = data.length.toLong * 8
    def readCode(): Int = {
      require(bitPos + codeWidth <= totalBits, "GIF: truncated LZW stream")
      var v = 0; var i = 0
      while (i < codeWidth) {
        val bp = bitPos + i
        v |= ((data((bp >> 3).toInt) >> (bp & 7).toInt) & 1) << i
        i += 1
      }
      bitPos += codeWidth
      v
    }
    // root literal of a code's expansion chain
    def rootOf(c0: Int): Int = {
      var c = c0
      while (c >= clear) { require(c >= clear + 2, "GIF: chain through clear/end"); c = prefix(c) }
      c
    }
    // append code's expansion to out, return its first byte
    def emit(code: Int): Int = {
      var c = code; var n = 0
      while (c >= clear) {
        require(c >= clear + 2, "GIF: chain through clear/end")
        chain(n) = suffix(c); n += 1; c = prefix(c)
      }
      require(outPos + n + 1 <= expected, "GIF: pixel stream longer than the image")
      out(outPos) = c.toByte; outPos += 1
      var i = n - 1
      while (i >= 0) { out(outPos) = chain(i); outPos += 1; i -= 1 }
      c
    }
    var done = false
    while (!done) {
      val code = readCode()
      if (code == clear) {
        dictSize = clear + 2; codeWidth = minCodeSize + 1; prev = -1
      } else if (code == end) {
        require(outPos == expected,
          s"GIF: pixel stream is $outPos bytes, expected $expected")
        done = true
      } else if (prev < 0) {
        require(code < clear, s"GIF: first code after clear must be a literal, got $code")
        emit(code)
        prev = code
      } else if (code < dictSize) {
        val first = emit(code)
        if (dictSize < 4096) {
          prefix(dictSize) = prev; suffix(dictSize) = first.toByte; dictSize += 1
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prev = code
      } else if (code == dictSize && dictSize < 4096) {
        // KwKwK: the code being defined right now — prev's expansion plus
        // its own first byte
        prefix(dictSize) = prev; suffix(dictSize) = rootOf(prev).toByte; dictSize += 1
        emit(dictSize - 1)
        if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        prev = dictSize - 1
      } else {
        throw new IllegalArgumentException(s"GIF: LZW code $code out of range (dict $dictSize)")
      }
    }
    out
  }

  /** WAV (RIFF) with uncompressed integer PCM (format tag 1; 8-, 16-, or
    * 24-bit), IEEE float32 (format tag 3), or IMA/DVI ADPCM (format tag
    * 17, mono, 4-bit — the one COMPRESSED WAV that actually ships;
    * G.711 µ-law (tag 7) and A-law (tag 6) — the telephony companding
    * formats, expanded per byte with the Sun/CCITT reference formulas
    * onto the 16-bit grid, mono or stereo with the same floor-mean
    * downmix;
    * decoded through the full public state machine: per-block int16
    * predictor header as sample 0, step-index header, low-nibble-first
    * packing, the 89-entry step table, diff accumulation from the
    * nibble's bits, ±32768 rails and 0..88 index clamps), mono or stereo:
    * `RIFF <size> WAVE`, then a CHUNK WALK — the `fmt ` chunk may be
    * preceded/followed by chunks a real encoder emits (`LIST`, `fact`,
    * `bext`...), which are skipped by their declared length (odd sizes pad
    * one byte, per spec); decode takes the first `data` chunk after a
    * valid `fmt `. Integer samples are little-endian signed per spec
    * (8-bit unsigned). Float32 samples (the other uncompressed format
    * real speech corpora land as) are QUANTIZED at the decoder to the
    * 16-bit integer grid with the pinned exact map
    * `clamp(trunc(f * 32768), -32768, 32767)` — `f * 32768` multiplies by
    * a power of two (no rounding in IEEE arithmetic) and trunc-toward-zero
    * matches SQL `trunc`, so an oracle can reconstruct the float's exact
    * value from its 4 source bytes in double math (sign/exponent/mantissa
    * unpack — every float32 is exactly a double) and reproduce the
    * quantization bit-for-bit; non-finite samples reject. Stereo is
    * downmixed to mono with the EXACT integer floor mean `(L + R) >> 1`
    * (arithmetic shift = floor((L+R)/2); for 16-bit identically
    * `(L+R+65536)/2 - 32768`, the spelling an integer-division oracle can
    * reproduce without negative-division ambiguity — float sources
    * quantize per channel FIRST, then mix on the integer grid). Strict
    * rejects for compressed forms, >2 channels, and depth/format
    * combinations outside {1:8/16/24, 3:32} — this decoder verifies,
    * quantizes, and downmixes exactly, it never resamples.
    */
  /** IMA step-size table (89 entries) and index-adjust table — the
    * public DVI/IMA ADPCM constants every implementation shares.
    */
  private val ImaSteps: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val ImaIndex: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** G.711 µ-law byte → 16-bit sample (the Sun/CCITT reference decode:
    * complement, biased mantissa shifted by the segment, sign from bit
    * 7; range ±32124).
    */
  def ulawToLinear(b: Int): Int = {
    val u = ~b & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law byte → 16-bit sample (XOR 0x55, segment-shifted
    * mantissa, sign bit SET means positive; range ±32256).
    */
  def alawToLinear(b: Int): Int = {
    val a = b ^ 0x55
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    if (seg == 0) t += 8
    else t = (t + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  def decodeWav(bytes: Array[Byte]): PcmAudio = {
    require(bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F', "not a RIFF file")
    require(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "RIFF but not WAVE")
    var pos = 12
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var isFloat = false
    var adpcm = false
    var g711 = 0 // 6 = A-law, 7 = mu-law (companded 8-bit -> 16-bit grid)
    var blockAlign = -1
    var samplesPerBlock = -1
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = le32(bytes, pos + 4)
      require(size >= 0, s"WAV: negative chunk size at byte $pos")
      val body = pos + 8
      id match {
        case "fmt " =>
          require(size >= 16, s"WAV: fmt chunk too short ($size)")
          require(body + 16 <= bytes.length, "WAV: truncated fmt chunk")
          val formatTag = le16(bytes, body)
          channels = le16(bytes, body + 2)
          bits = le16(bytes, body + 14)
          require(formatTag == 1 || formatTag == 3 || formatTag == 0x11 ||
            formatTag == 6 || formatTag == 7,
            s"WAV: only PCM (1), IEEE float (3), A-law (6), mu-law (7), and IMA-ADPCM (17) supported, got $formatTag")
          isFloat = formatTag == 3
          adpcm = formatTag == 0x11
          if (adpcm) {
            // mono-only by design: stereo IMA interleaves per-channel
            // 4-byte nibble groups — a named reject, not silent garbage
            require(channels == 1, s"WAV: IMA-ADPCM decode is mono-only, got $channels channels")
            require(bits == 4, s"WAV: IMA-ADPCM must be 4-bit, got $bits")
            blockAlign = le16(bytes, body + 12)
            require(size >= 20 && body + 20 <= bytes.length,
              "WAV: ADPCM fmt chunk missing the samplesPerBlock extension")
            samplesPerBlock = le16(bytes, body + 18)
            require(blockAlign >= 5 && samplesPerBlock == 1 + 2 * (blockAlign - 4),
              s"WAV: ADPCM samplesPerBlock $samplesPerBlock does not match blockAlign $blockAlign")
          } else {
            require(channels == 1 || channels == 2,
              s"WAV: only mono/stereo supported, got $channels channels")
            g711 = if (formatTag == 6 || formatTag == 7) formatTag else 0
            if (g711 != 0)
              require(bits == 8, s"WAV: G.711 must be 8-bit, got $bits")
            else if (isFloat)
              require(bits == 32, s"WAV: IEEE float must be 32-bit, got $bits")
            else
              require(bits == 8 || bits == 16 || bits == 24,
                s"WAV: only 8/16/24-bit PCM supported, got $bits")
          }
          sampleRate = le32(bytes, body + 4)
          require(sampleRate > 0, s"WAV: bad sample rate $sampleRate")
        case "data" if adpcm =>
          require(sampleRate > 0, "WAV: data chunk before a valid fmt chunk")
          require(body + size <= bytes.length, "WAV: truncated data chunk")
          require(size % blockAlign == 0,
            s"WAV: ADPCM data size $size is not a multiple of blockAlign $blockAlign")
          val nBlocks = size / blockAlign
          val out = new Array[Int](nBlocks * samplesPerBlock)
          var o = 0
          var b = 0
          while (b < nBlocks) {
            val base = body + b * blockAlign
            // block header: initial predictor (int16 LE) IS sample 0,
            // then the step index; each following byte is two nibbles,
            // LOW first
            var pred = (bytes(base) & 0xff) | (bytes(base + 1).toInt << 8)
            var idx = bytes(base + 2) & 0xff
            require(idx <= 88, s"WAV: ADPCM step index $idx out of range")
            out(o) = pred; o += 1
            var j = 0
            while (j < blockAlign - 4) {
              val two = bytes(base + 4 + j) & 0xff
              var half = 0
              while (half < 2) {
                val n = if (half == 0) two & 0x0f else two >> 4
                val step = ImaSteps(idx)
                var diff = step >> 3
                if ((n & 1) != 0) diff += step >> 2
                if ((n & 2) != 0) diff += step >> 1
                if ((n & 4) != 0) diff += step
                pred = if ((n & 8) != 0) pred - diff else pred + diff
                if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
                idx += ImaIndex(n & 7)
                if (idx < 0) idx = 0 else if (idx > 88) idx = 88
                out(o) = pred; o += 1
                half += 1
              }
              j += 1
            }
            b += 1
          }
          return PcmAudio(sampleRate, 16, out)
        case "data" =>
          require(sampleRate > 0, "WAV: data chunk before a valid fmt chunk")
          require(body + size <= bytes.length, "WAV: truncated data chunk")
          val bytesPer = bits / 8
          val frameBytes = channels * bytesPer
          require(size % frameBytes == 0,
            s"WAV: data size $size is not a multiple of the $frameBytes-byte frame")
          val n = size / frameBytes
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            def sample(c: Int): Int = {
              val off = body + i * frameBytes + c * bytesPer
              bits match {
                case 8 if g711 == 7 => ulawToLinear(bytes(off) & 0xff)
                case 8 if g711 == 6 => alawToLinear(bytes(off) & 0xff)
                case 8  => bytes(off) & 0xff
                case 16 => (bytes(off) & 0xff) | (bytes(off + 1).toInt << 8) // LE signed
                case 24 => (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
                  (bytes(off + 2).toInt << 16) // LE signed, sign from byte 2
                case _ => // float32: quantize to the 16-bit grid, exactly
                  val f = java.lang.Float.intBitsToFloat(le32(bytes, off))
                  require(java.lang.Float.isFinite(f), s"WAV: non-finite float sample $i")
                  val q = (f.toDouble * 32768.0).toLong // exact product, trunc toward 0
                  math.min(32767L, math.max(-32768L, q)).toInt
              }
            }
            out(i) =
              if (channels == 1) sample(0)
              else (sample(0) + sample(1)) >> 1 // pinned downmix: floor mean
            i += 1
          }
          return PcmAudio(sampleRate, if (g711 != 0) 16 else bits, out)
        case _ => // unknown chunk: skip by declared length
      }
      pos = body + size + (size & 1) // chunks are word-aligned: odd sizes pad
    }
    throw new IllegalArgumentException("WAV: no data chunk found")
  }

  /** Banded amplitude features over decoded PCM: [[Multimodal.FeatureDim]]
    * contiguous sample bands, each the EXACT integer sum of |sample - 128|
    * over its samples divided by `bandSamples * 128` — the audio twin of
    * [[bandedLuma]] (integer sums, ONE double division, one float round).
    */
  def bandedAmplitude(audio: PcmAudio, dim: Int = Multimodal.FeatureDim): Array[Float] =
    bandedSums(audio.samples.length, dim, audio.fullScale, audio.amplitude)

  /** Decoded uncompressed video, NORMALIZED to C444 planar frames — each
    * frame is `width*height` Y bytes, then U, then V (PLANAR, not
    * interleaved; the YUV4MPEG2 layout). Subsampled sources (C420) arrive
    * already chroma-upsampled by the decoder, so every consumer sees one
    * full-resolution layout.
    */
  final case class PlanarVideo(width: Int, height: Int, frames: IndexedSeq[Array[Byte]]) {
    /** Frame i's luma plane (the first width*height bytes). */
    def yPlane(i: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(frames(i), 0, width * height)

    /** Frame i's (normalized full-resolution) U chroma plane. */
    def uPlane(i: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(frames(i), width * height, 2 * width * height)

    /** Frame i's (normalized full-resolution) V chroma plane. */
    def vPlane(i: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(frames(i), 2 * width * height, 3 * width * height)
  }

  /** Chroma tags sharing the C420 plane geometry (Y w*h, then U and V each
    * (w/2)*(h/2)). The suffixes (jpeg/mpeg2/paldv) differ only in chroma
    * SITING — which corner of the 2x2 luma block the sample is centered
    * on — which matters to interpolating upsamplers and is irrelevant to
    * the pinned nearest-neighbor normalization below.
    */
  private val C420Tags = Set("C420", "C420jpeg", "C420mpeg2", "C420paldv")

  /** Chroma tag → (sx, sy): how many luma columns/rows each chroma sample
    * covers. C444 full, C422 half-width (broadcast 4:2:2), the C420 family
    * quarter (consumer video), C411 quarter-width (DV). Anything else —
    * mono (no chroma to normalize: synthesizing it would be inventing
    * data), interlaced-chroma tags — rejects strictly.
    */
  private def chromaFactors(chroma: String): (Int, Int) = chroma match {
    case "C444"               => (1, 1)
    case "C422"               => (2, 1)
    case "C411"               => (4, 1)
    case c if C420Tags(c)     => (2, 2)
    case other => throw new IllegalArgumentException(
      s"Y4M: only C444/C422/C420-family/C411 supported, got $other")
  }

  /** YUV4MPEG2 (.y4m) with C444, C422, C420-family, or C411 planar frames
    * — the one VIDEO container a pure JVM can decode without codecs: a
    * plain-text stream header (`YUV4MPEG2 W<w> H<h> ... C<chroma>\n`),
    * then per frame a `FRAME` marker line (optionally with its own
    * parameters) followed by the raw plane bytes — `w*h + 2*(w/sx)*(h/sy)`
    * for the tag's [[chromaFactors]]: 3·wh for C444, 2·wh for C422
    * (broadcast 4:2:2), 1.5·wh for the C420 family (virtually all
    * consumer Y4M in the wild) and for C411 (DV). The parser reads the
    * header parameters for real (W/H required; C must declare a supported
    * tag, including the spec's C420jpeg default when C is absent; F/I/A
    * ignored), walks the frame markers, validates every frame is
    * complete, and NORMALIZES subsampled frames to C444 by
    * nearest-neighbor chroma upsampling (each chroma sample covers its
    * sx·sy luma block — pinned, deterministic, siting ignored). Strict
    * rejects for mono (no chroma to normalize — synthesizing one would be
    * inventing data) and interlaced-chroma tags — this decoder verifies
    * and upsamples exactly, it never interpolates.
    */
  def decodeY4m(bytes: Array[Byte]): PlanarVideo = {
    val magic = "YUV4MPEG2"
    require(bytes.length >= magic.length + 1 &&
      new String(bytes, 0, magic.length, "US-ASCII") == magic, "not a YUV4MPEG2 stream")
    var pos = magic.length
    var width = -1; var height = -1; var chroma = "C420jpeg" // spec default
    while (pos < bytes.length && bytes(pos) != '\n') {
      require(bytes(pos) == ' ', s"Y4M: malformed header at byte $pos")
      pos += 1
      val start = pos
      while (pos < bytes.length && bytes(pos) != ' ' && bytes(pos) != '\n') pos += 1
      val param = new String(bytes, start, pos - start, "US-ASCII")
      // numeric params parse strictly: non-digit, empty, or absurdly long
      // values reject with the module's IllegalArgumentException contract
      // rather than leaking NumberFormatException (negatives never parse:
      // '-' is not a digit)
      def dim(): Int = {
        val t = param.tail
        require(t.nonEmpty && t.length <= 9 && t.forall(c => c >= '0' && c <= '9'),
          s"Y4M: bad numeric parameter '$param'")
        t.toInt
      }
      param.headOption match {
        case Some('W') => width = dim()
        case Some('H') => height = dim()
        case Some('C') => chroma = param
        case _ => // F (rate), I (interlace), A (aspect), X (extension): ignored
      }
    }
    require(pos < bytes.length, "Y4M: truncated header")
    pos += 1 // consume the header newline
    require(width > 0 && height > 0, s"Y4M: missing or bad dimensions ${width}x$height")
    val (sx, sy) = chromaFactors(chroma)
    require(width % sx == 0 && height % sy == 0,
      s"Y4M: $chroma needs dimensions divisible by ${sx}x$sy, got ${width}x$height")
    // Long math: 3*width*height for a hostile 65536x65536 header must
    // reject as truncated, never wrap to a small Int
    val frameBytesL =
      width.toLong * height + 2L * (width / sx) * (height / sy)
    val frames = IndexedSeq.newBuilder[Array[Byte]]
    while (pos < bytes.length) {
      require(pos + 5 <= bytes.length &&
        new String(bytes, pos, 5, "US-ASCII") == "FRAME", s"Y4M: expected FRAME at byte $pos")
      pos += 5
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1 // frame params
      require(pos < bytes.length, "Y4M: truncated FRAME marker")
      pos += 1
      require(pos + frameBytesL <= bytes.length, "Y4M: truncated frame data")
      val frameBytes = frameBytesL.toInt // safe: bounded by bytes.length above
      val raw = java.util.Arrays.copyOfRange(bytes, pos, pos + frameBytes)
      frames += (if (sx == 1 && sy == 1) raw else upsampleChroma(raw, width, height, sx, sy))
      pos += frameBytes
    }
    PlanarVideo(width, height, frames.result())
  }

  /** Nearest-neighbor chroma normalization to C444: each chroma sample
    * covers its sx·sy luma block (pinned, deterministic, siting ignored).
    */
  private def upsampleChroma(f: Array[Byte], w: Int, h: Int, sx: Int, sy: Int): Array[Byte] = {
    val n = w * h
    val cw = w / sx
    val cn = cw * (h / sy)
    val out = new Array[Byte](3 * n)
    System.arraycopy(f, 0, out, 0, n)
    var p = 0 // 0 = U, 1 = V
    while (p < 2) {
      val src = n + p * cn
      val dst = n * (1 + p)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(dst + y * w + x) = f(src + (y / sy) * cw + (x / sx))
          x += 1
        }
        y += 1
      }
      p += 1
    }
    out
  }

  /** Banded luma over a single decoded frame's Y PLANE: the video twin of
    * [[bandedLuma]]/[[bandedAmplitude]] (exact integer sums of the luma
    * bytes, ONE double division, one float round).
    */
  def bandedLumaY(video: PlanarVideo, frame: Int, dim: Int = Multimodal.FeatureDim): Array[Float] = {
    val y = video.yPlane(frame)
    bandedSums(y.length, dim, 255.0, i => y(i) & 0xff)
  }

  /** Constant Y4M stream header for fixed geometry — like [[wavHeader]], a
    * constant byte string the payload-builder queries concat as a literal.
    */
  /** Constant BMP header (file header + BITMAPINFOHEADER) for fixed
    * geometry — like [[wavHeaderPcm]], a byte literal the payload-builder
    * queries `concat` in front of document bytes. The palette (for 8bpp)
    * and pixel rows follow; `pixelOffset` accounts for `nColors` BGRA
    * palette entries.
    */
  def bmpHeader(width: Int, height: Int, bpp: Int, nColors: Int = 0,
      topDown: Boolean = false, compression: Int = 0,
      dataBytes: Int = -1): Array[Byte] = {
    val rowBytes = ((width * (bpp / 8) + 3) / 4) * 4
    val size = if (dataBytes >= 0) dataBytes else rowBytes * height
    val pixelOffset = 54 + 4 * nColors
    val b = java.nio.ByteBuffer.allocate(54).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(pixelOffset + size)
      .putInt(0).putInt(pixelOffset)
    b.putInt(40).putInt(width).putInt(if (topDown) -height else height)
      .putShort(1).putShort(bpp.toShort).putInt(compression).putInt(size)
      .putInt(2835).putInt(2835).putInt(nColors).putInt(0)
    b.array()
  }

  def y4mHeader(width: Int, height: Int, chroma: String = "C444"): Array[Byte] =
    s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 $chroma\n".getBytes("US-ASCII")

  /** Constant 44-byte WAV header for `frames` PCM frames of the given
    * geometry at `rate` Hz — the canonical minimal layout (RIFF + fmt +
    * data) with the derived fields (byte rate, block align, sizes) computed
    * per spec. Used by fixtures and the payload-builder queries (for FIXED
    * geometry the header is a constant byte string, so Spark can `concat`
    * it as a literal).
    */
  def wavHeaderPcm(frames: Int, rate: Int, channels: Int, bits: Int,
      formatTag: Int = 1): Array[Byte] = {
    val frameBytes = channels * (bits / 8)
    val dataBytes = frames * frameBytes
    // non-PCM formats carry a `fact` chunk (frame count) per RIFF spec —
    // emitting it makes the fixture a faithful float WAV and exercises the
    // decoder's chunk walk on every float clip
    val factBytes = if (formatTag == 3) 12 else 0
    val b = java.nio.ByteBuffer.allocate(44 + factBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + factBytes + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(formatTag.toShort).putShort(channels.toShort).putInt(rate)
      .putInt(rate * frameBytes)
      .putShort(frameBytes.toShort).putShort(bits.toShort)
    if (formatTag == 3)
      b.put("fact".getBytes("US-ASCII")).putInt(4).putInt(frames)
    b.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    b.array()
  }

  /** The 8-bit mono layout every earlier fixture uses. */
  def wavHeader(n: Int, rate: Int = 8000): Array[Byte] =
    wavHeaderPcm(n, rate, channels = 1, bits = 8)

  /** ITU T.81 Annex K.3.3.1 luminance DC Huffman table (counts per code
    * length 1..16, then the category symbols) — the standard table every
    * real encoder ships.
    */
  val JpegDcLumCounts: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val JpegDcLumVals: Array[Int] = (0 to 11).toArray

  /** Canonical code strings the DC table above assigns to categories 0..8
    * (all a 48-byte-document diff can need) — derivable from the counts,
    * pinned here so the SQL fixture emitter and the decoder are
    * independent implementations of the same public table.
    */
  val JpegDcLumCodes: Seq[String] =
    Seq("00", "010", "011", "100", "101", "110", "1110", "11110", "111110")

  /** Annex K.3.3.2 luminance AC table. EOB is the length-4 code `1010`. */
  val JpegAcLumCounts: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  val JpegAcLumVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  /** Everything of a baseline JPEG up to (and including) SOS, for `comps`
    * components with the given (h, v) sampling factors: SOI, a flat-8
    * quant table (slot 0 — so a dequantized DC of `8d` IDCTs to exactly
    * `d` in a DC-only block: `8d·(1/√2)(1/√2)/4 = d`), the Annex K
    * luminance DC+AC tables (slot 0, shared by every component — legal
    * and standard-derived), optional DRI, and a SOF0/SOS pair wiring all
    * components to those tables. With fixed geometry this is one constant
    * byte string, so the SQL fixture emitter `concat`s it as a literal
    * (the BMP/WAV/Y4M/GIF pattern) and only the entropy-coded scan varies
    * per document.
    */
  def jpegHeader(width: Int, height: Int, dri: Int,
      comps: Seq[(Int, Int)] = Seq((1, 1))): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, body: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xdb, 0x00 +: Array.fill(64)(8)) // DQT slot 0, all 8
    seg(0xc4, 0x00 +: (JpegDcLumCounts ++ JpegDcLumVals)) // DHT DC slot 0
    seg(0xc4, 0x10 +: (JpegAcLumCounts ++ JpegAcLumVals)) // DHT AC slot 0
    if (dri > 0) seg(0xdd, Array(dri >> 8, dri & 0xff))
    val sof = Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      comps.length) ++
      comps.zipWithIndex.flatMap { case ((h, v), i) =>
        Array(i + 1, (h << 4) | v, 0)
      }
    seg(0xc0, sof)
    val sos = Array(comps.length) ++
      comps.indices.flatMap(i => Array(i + 1, 0x00)) ++ Array(0, 63, 0)
    seg(0xda, sos)
    out.toByteArray
  }

  /** Progressive (SOF2) twin of [[jpegHeader]] for grayscale, as the
    * two-scan successive-approximation script the fixture emitter uses:
    * returns (everything up to and including the FIRST scan's SOS — DC
    * first, Ah=0, Al=al) and (the SECOND scan's SOS segment — DC
    * refinement, Ah=al, Al=0). With al=1 the refinement is one raw bit
    * per block and `coef = (t << 1) | bit` reconstructs the sequential
    * DC exactly, so the progressive fixture decodes to the SAME pixels
    * as the baseline one and shares its oracle.
    */
  def jpegProgHeader(width: Int, height: Int, dri: Int,
      al: Int = 1): (Array[Byte], Array[Byte]) = {
    val out = new java.io.ByteArrayOutputStream()
    def seg(o: java.io.ByteArrayOutputStream, marker: Int, body: Array[Int]): Unit = {
      o.write(0xff); o.write(marker)
      val len = body.length + 2
      o.write(len >> 8); o.write(len & 0xff)
      body.foreach(o.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(out, 0xdb, 0x00 +: Array.fill(64)(8)) // DQT slot 0, all 8
    seg(out, 0xc4, 0x00 +: (JpegDcLumCounts ++ JpegDcLumVals)) // DHT DC slot 0
    if (dri > 0) seg(out, 0xdd, Array(dri >> 8, dri & 0xff))
    seg(out, 0xc2, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff,
      1, 1, 0x11, 0)) // SOF2, one 1x1 component
    seg(out, 0xda, Array(1, 1, 0x00, 0, 0, al)) // DC first: Ss=Se=0, Ah=0, Al=al
    val sos2 = new java.io.ByteArrayOutputStream()
    seg(sos2, 0xda, Array(1, 1, 0x00, 0, 0, (al << 4) | 0)) // DC refine: Ah=al, Al=0
    (out.toByteArray, sos2.toByteArray)
  }

  /** Encode a raster back to binary PPM — the round-trip twin of
    * [[decodePpm]], used by tests and fixtures (e.g. re-encoding a BMP as
    * the "same image, different container" near-dup case).
    */
  def encodePpm(img: RasterImage): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Banded luma features over the decoded pixels: [[Multimodal.FeatureDim]]
    * contiguous row-major bands, each the EXACT integer sum of R+G+B over
    * its pixels divided by `3 * bandPixels * 255` — one double division per
    * band, then one float round, so the value is bit-reproducible across
    * engines (the same integer-sums-then-one-division discipline as the
    * aHash mean). Mirrors the stub's contract: Array[Float] of FeatureDim
    * values in [0, 1].
    */
  def bandedLuma(img: RasterImage, dim: Int = Multimodal.FeatureDim): Array[Float] =
    bandedSums(img.pixelCount, dim, 3.0 * 255.0, img.rgbSum)

  /** The ONE banded reduction all three featurizers share: `dim` contiguous
    * bands over `n` elements, band k = exact integer sum of `value(i)` for
    * i in [k*n/dim, (k+1)*n/dim) divided by `denomPerElement * bandSize` —
    * one double division per band, then one float round, so every modality
    * is bit-reproducible across engines by the same discipline.
    */
  private def bandedSums(n: Int, dim: Int, denomPerElement: Double,
      value: Int => Int): Array[Float] = {
    val out = new Array[Float](dim)
    var k = 0
    while (k < dim) {
      val start = (k.toLong * n / dim).toInt
      val end = ((k + 1).toLong * n / dim).toInt
      var sum = 0L
      var i = start
      while (i < end) { sum += value(i); i += 1 }
      if (end > start) out(k) = (sum / (denomPerElement * (end - start))).toFloat
      k += 1
    }
    out
  }

  /** Box-average resize of a decoded raster to `w x h`: target pixel (x, y)
    * averages the source box `[x*W/w, (x+1)*W/w) x [y*H/h, (y+1)*H/h)` per
    * channel with EXACT integer arithmetic (sum of box samples divided by
    * box size, truncating — identical in any engine), the same floor-bound
    * banding discipline as the featurizers. Downscale is proper box
    * filtering; upscale degenerates to nearest-neighbor (boxes of one
    * source pixel) — both deterministic.
    */
  def resize(img: RasterImage, w: Int, h: Int): RasterImage = {
    require(w > 0 && h > 0, s"resize: bad target ${w}x$h")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val sy0 = (y.toLong * img.height / h).toInt
      val sy1 = ((y + 1).toLong * img.height / h).toInt max (sy0 + 1)
      var x = 0
      while (x < w) {
        val sx0 = (x.toLong * img.width / w).toInt
        val sx1 = ((x + 1).toLong * img.width / w).toInt max (sx0 + 1)
        var c = 0
        while (c < 3) {
          var sum = 0L
          var sy = sy0
          while (sy < sy1) {
            var sx = sx0
            while (sx < sx1) {
              sum += (img.rgb(3 * (sy * img.width + sx) + c) & 0xff)
              sx += 1
            }
            sy += 1
          }
          out(3 * (y * w + x) + c) = (sum / ((sy1 - sy0).toLong * (sx1 - sx0))).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    RasterImage(w, h, out)
  }

  /** 64-bit perceptual average-hash over DECODED pixels: average-pool the
    * luma (integer R+G+B per pixel) onto an 8x8 grid, threshold each cell
    * against the grid mean, pack bits row-major — the real-decode twin of
    * the payload-byte aHash in [[Multimodal.ahashDedup]]. Container-
    * independent: a BMP and a PPM of the same pixels hash identically.
    */
  /** Apply an EXIF display orientation (1..8) to a decoded raster: the
    * stored pixels transformed to how a viewer presents them (Exif 2.3
    * tag 0x0112 semantics — 2 mirror-H, 3 rotate 180, 4 mirror-V, 5
    * transpose, 6 rotate 90 CW, 7 transverse, 8 rotate 90 CCW; 5–8 swap
    * the output dimensions). Orientation-normalizing BEFORE hashing
    * makes a rotated re-encode of the same photo land in the same
    * near-dup bucket — without it the dedup collapses such pairs only
    * by luck.
    */
  def applyOrientation(img: RasterImage, orientation: Int): RasterImage = {
    require(orientation >= 1 && orientation <= 8,
      s"orientation $orientation outside the EXIF 1..8 range")
    if (orientation == 1) return img
    val w = img.width
    val h = img.height
    val swap = orientation >= 5
    val (ow, oh) = if (swap) (h, w) else (w, h)
    val out = new Array[Byte](3 * w * h)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        // source pixel shown at display position (y, x)
        val (sy, sx) = orientation match {
          case 2 => (y, w - 1 - x) // mirror horizontal
          case 3 => (h - 1 - y, w - 1 - x) // rotate 180
          case 4 => (h - 1 - y, x) // mirror vertical
          case 5 => (x, y) // transpose
          case 6 => (h - 1 - x, y) // rotate 90 CW (row 0 shown at right)
          case 7 => (h - 1 - x, w - 1 - y) // transverse
          case _ => (x, w - 1 - y) // 8: rotate 90 CCW (row 0 shown at left)
        }
        val s = 3 * (sy * w + sx)
        val d = 3 * (y * ow + x)
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    RasterImage(ow, oh, out)
  }

  /** Orientation-normalized perceptual hash: read the payload's EXIF
    * orientation ([[graft.pipeline.Exif.orientationOf]] — 1 when the
    * metadata is absent), decode, apply the display transform, then
    * [[ahash64]]. The image-dedup entry point for camera-sourced
    * corpora.
    */
  def orientedAhash64(payload: Array[Byte]): Long = {
    val o = graft.pipeline.Exif.orientationOf(payload)
    ahash64(applyOrientation(decode(payload), o))
  }

  def ahash64(img: RasterImage): Long = {
    val grid = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < img.height) {
      val gy = y * 8 / img.height
      var x = 0
      while (x < img.width) {
        val gx = x * 8 / img.width
        val cell = gy * 8 + gx
        grid(cell) += img.rgbSum(y * img.width + x)
        counts(cell) += 1L
        x += 1
      }
      y += 1
    }
    // cell means as exact rationals: compare grid(c)/counts(c) > mean
    // (= sum(grid)/sum(counts)) via cross-multiplication — no doubles at all
    val totalSum = grid.sum
    val totalCount = counts.sum
    var h = 0L
    var c = 0
    while (c < 64) {
      if (counts(c) > 0 && grid(c) * totalCount > totalSum * counts(c))
        h |= (1L << c)
      c += 1
    }
    h
  }

  // ------------------------------------------------------------------ JPEG

  /** JPEG zigzag order: `ZigZag(i)` = row-major index of coefficient `i`. */
  private val ZigZag: Array[Int] = {
    val zz = new Array[Int](64)
    var x = 0; var y = 0; var up = true
    var i = 0
    while (i < 64) {
      zz(i) = y * 8 + x
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
      i += 1
    }
    zz
  }

  /** Separable IDCT basis with the DC 1/√2 normalization folded in:
    * `IdctCos(x)(u) = C(u)·cos((2x+1)uπ/16)`, so
    * `f(x,y) = ¼ ΣΣ IdctCos(y)(v)·IdctCos(x)(u)·F(v,u)`.
    */
  private val IdctCos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman table in the spec's own decode form (ITU T.81 Annex
    * F.2.2.3: MINCODE/MAXCODE/VALPTR per code length).
    */
  private final class JpegHuffTable(counts: Array[Int], symbols: Array[Int]) {
    require(counts.length == 16, "DHT needs 16 length counts")
    require(symbols.length == counts.sum, "DHT symbol count mismatch")
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1) // -1 = no codes of this length
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (counts(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxCode(l) = code - 1
        }
        require(code <= (1 << l), s"DHT over-full at length $l")
        code <<= 1
        l += 1
      }
    }
    def decode(in: JpegBitReader): Int = {
      var code = in.nextBit()
      var l = 1
      while (maxCode(l) < 0 || code > maxCode(l)) {
        require(l < 16, "invalid Huffman code in entropy stream")
        code = (code << 1) | in.nextBit()
        l += 1
      }
      symbols(valPtr(l) + code - minCode(l))
    }
  }

  /** MSB-first bit reader over the entropy-coded segment, consuming the
    * 0xFF00 byte stuffing; any other marker inside bit data is a strict
    * reject (restart markers are read byte-aligned by the caller, never
    * through here).
    */
  private final class JpegBitReader(bytes: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def nextBit(): Int = {
      if (nbits == 0) {
        require(pos < bytes.length, "truncated entropy stream")
        val b = bytes(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "truncated entropy stream after 0xFF")
          val m = bytes(pos) & 0xff
          require(m == 0x00, f"unexpected marker FF$m%02X inside entropy data")
          pos += 1 // stuffed zero: the data byte IS 0xFF
        }
        cur = b; nbits = 8
      }
      nbits -= 1
      (cur >>> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Drop to the next byte boundary (before a restart marker). */
    def align(): Unit = nbits = 0
  }

  /** JPEG EXTEND (T.81 F.12): map the `t` received magnitude bits to the
    * signed coefficient value.
    */
  @inline private def jpegExtend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final class JpegComp(val id: Int, val h: Int, val v: Int, val tq: Int) {
    var td = 0 // DC table selector (from SOS)
    var ta = 0 // AC table selector (from SOS)
    var pred = 0 // DC predictor
    var coefs: Array[Int] = null // per-block natural-order coefficients, padded grid
    var bwP = 0; var bhP = 0 // block grid padded to full MCUs (storage)
    var bw = 0; var bh = 0 // the component's own block grid (non-interleaved scans)
    var plane: Array[Int] = null // padded to full MCU grid
    var planeW = 0
  }

  /** JPEG (ITU T.81 / ISO 10918-1) decoded end to end in pure JVM —
    * baseline sequential (SOF0) AND progressive (SOF2). Full marker walk
    * (APPn/COM skipped, DQT 8- and 16-bit precision, multi-table DHT
    * segments possibly redefined between scans, DRI), canonical Huffman
    * entropy decode with 0xFF00 unstuffing and RSTn restart handling
    * (byte-aligned, DC predictors AND the EOB run reset, marker sequence
    * number verified per scan), dequantization, inverse zigzag, and the
    * spec's floating IDCT (pinned: `clamp(round(¼ΣΣ C·C·F·cos·cos) +
    * 128)`, `Math.round` half-up — exact for DC-only blocks by
    * construction).
    *
    * All frames decode through per-component COEFFICIENT buffers with a
    * single dequantize+IDCT pass at the end — baseline is the one-scan
    * special case, and progressive accumulates its scans there: DC first
    * (diff-coded, stored `<< Al`) and DC refinement (one raw bit per
    * block, OR-ed at `Al`), AC first (per-band runs with EOBn run
    * lengths, values `<< Al`) and AC refinement (T.81 G.1.2.3: correction
    * bits on nonzero-history coefficients, new ±1·2^Al on the run's
    * target zero, ZRL skipping 16 zero-history slots). Interleaved scans
    * step MCUs; single-component scans step the component's own
    * UNPADDED block raster (the spec's non-interleaved geometry).
    *
    * Grayscale (1 component) and 3-component YCbCr frames are supported
    * with GENERAL sampling factors h,v ∈ 1..4 — interleaved MCUs carry
    * h×v data units per component and subsampled planes are upsampled by
    * sample replication (`sx = x·h/hmax`, nearest — pinned). 3-component
    * output converts with the JFIF/BT.601 full-range matrix
    * `R = Y + 1.402·(Cr−128)`, `G = Y − 0.344136·(Cb−128) − 0.714136·(Cr−128)`,
    * `B = Y + 1.772·(Cb−128)`, each `clamp(round(·))`. Strict rejects, by
    * design: SOF1/SOF3/SOF5-7 by name, arithmetic coding, 12-bit
    * precision, DNL, component counts other than 1/3, truncated or
    * marker-corrupt entropy data, refinement runs past the band end. A
    * DQT/DHT/SOS that references an undefined table rejects rather than
    * guessing.
    */
  def decodeJpeg(bytes: Array[Byte]): RasterImage = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG (no SOI)")
    val quant = new Array[Array[Int]](4)
    val dcTab = new Array[JpegHuffTable](4)
    val acTab = new Array[JpegHuffTable](4)
    var restartInterval = 0
    var width = -1; var height = -1
    var comps: Array[JpegComp] = null
    var pos = 2
    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    var progressive = false
    var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0
    var scans = 0
    var eoi = false

    /** One scan's entropy-coded data, starting at `start`; returns the
      * byte offset just past it (aligned, before the next marker). Covers
      * the baseline full-band scan and all four progressive scan kinds.
      */
    def decodeScan(sc: Array[JpegComp], ss: Int, se: Int, ah: Int, al: Int,
        start: Int): Int = {
      val in = new JpegBitReader(bytes, start)
      sc.foreach(_.pred = 0)
      var eobrun = 0 // progressive AC: blocks remaining in the current EOB run

      def decodeUnit(c: JpegComp, off: Int): Unit = {
        val coefs = c.coefs
        if (!progressive) { // sequential: DC + full AC band in one pass
          val t = dcTab(c.td).decode(in)
          require(t <= 11, "DC category out of range")
          c.pred += jpegExtend(in.receive(t), t)
          coefs(off) = c.pred
          var k = 1
          while (k < 64) {
            val rs = acTab(c.ta).decode(in)
            val r = rs >> 4; val s = rs & 0x0f
            if (s == 0) {
              if (r == 15) k += 16 // ZRL
              else k = 64 // EOB
            } else {
              k += r
              require(k < 64, "AC run past block end")
              coefs(off + ZigZag(k)) = jpegExtend(in.receive(s), s)
              k += 1
            }
          }
        } else if (ss == 0) {
          if (ah == 0) { // DC first: diff accumulates unshifted, stored << Al
            val t = dcTab(c.td).decode(in)
            require(t <= 11, "DC category out of range")
            c.pred += jpegExtend(in.receive(t), t)
            coefs(off) = c.pred << al
          } else { // DC refinement: one raw bit per block
            if (in.nextBit() != 0) coefs(off) |= (1 << al)
          }
        } else if (ah == 0) { // AC first pass over [Ss,Se], values << Al
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var done = false
            while (k <= se && !done) {
              val rs = acTab(c.ta).decode(in)
              val r = rs >> 4; val s = rs & 0x0f
              if (s != 0) {
                k += r
                require(k <= se, "AC run past band end")
                coefs(off + ZigZag(k)) = jpegExtend(in.receive(s), s) << al
                k += 1
              } else if (r == 15) k += 16 // ZRL
              else { // EOBn: this block is the first of the run
                eobrun = (1 << r) - 1
                if (r > 0) eobrun += in.receive(r)
                done = true
              }
            }
          }
        } else { // AC refinement (T.81 G.1.2.3): correction bits + new ±1s
          val p1 = 1 << al; val m1 = -1 << al
          @inline def refine(z: Int): Unit =
            if (in.nextBit() != 0 && (coefs(z) & p1) == 0)
              coefs(z) += (if (coefs(z) >= 0) p1 else m1)
          var k = ss
          if (eobrun == 0) {
            var brk = false
            while (k <= se && !brk) {
              val rs = acTab(c.ta).decode(in)
              var r = rs >> 4
              var sNew = 0
              if ((rs & 0x0f) != 0) {
                require((rs & 0x0f) == 1, "AC refinement magnitude must be 1")
                sNew = if (in.nextBit() != 0) p1 else m1
              } else if (r != 15) { // EOBn: current block finishes below
                eobrun = 1 << r
                if (r > 0) eobrun += in.receive(r)
                brk = true
              } // r == 15, s == 0: ZRL — skip 16 zero-history coefficients
              if (!brk) {
                var placed = false
                while (k <= se && !placed) {
                  val z = off + ZigZag(k)
                  if (coefs(z) != 0) refine(z)
                  else if (r == 0) { // the target zero-history coefficient
                    if (sNew != 0) coefs(z) = sNew
                    placed = true
                  } else r -= 1
                  k += 1
                }
                require(sNew == 0 || placed, "AC refine ran past band end")
              }
            }
          }
          if (eobrun > 0) { // correction bits through the rest of the band
            while (k <= se) {
              val z = off + ZigZag(k)
              if (coefs(z) != 0) refine(z)
              k += 1
            }
            eobrun -= 1
          }
        }
      }

      // interleaved scans step MCUs; single-component scans step the
      // component's own (unpadded) block raster — T.81's non-interleaved
      // geometry, which is also what makes partial-frame DC scans correct
      val interleaved = sc.length > 1
      val units = if (interleaved) mcusX * mcusY else sc(0).bw * sc(0).bh
      var unit = 0
      var rstN = 0
      while (unit < units) {
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          in.align()
          require(in.pos + 2 <= bytes.length, "truncated at restart")
          val m = ((bytes(in.pos) & 0xff) << 8) | (bytes(in.pos + 1) & 0xff)
          require(m == 0xffd0 + rstN, f"expected RST$rstN%d, got $m%04X")
          in.pos += 2
          rstN = (rstN + 1) % 8
          sc.foreach(_.pred = 0)
          eobrun = 0
        }
        if (interleaved) {
          val my = unit / mcusX; val mx = unit % mcusX
          sc.foreach { c =>
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                decodeUnit(c, ((my * c.v + by) * c.bwP + (mx * c.h + bx)) * 64)
                bx += 1
              }
              by += 1
            }
          }
        } else {
          val c = sc(0)
          decodeUnit(c, ((unit / c.bw) * c.bwP + unit % c.bw) * 64)
        }
        unit += 1
      }
      in.align()
      in.pos
    }

    while (!eoi) {
      require(pos + 2 <= bytes.length, "truncated before EOI")
      require((bytes(pos) & 0xff) == 0xff, f"expected marker, got ${bytes(pos)}%02X")
      val marker = bytes(pos + 1) & 0xff
      pos += 2
      if (marker == 0xff) pos -= 1 // fill byte, resync
      else if (marker == 0xd9) eoi = true
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7))
        () // standalone markers: legal, no segment
      else {
        require(pos + 2 <= bytes.length, "truncated segment length")
        val len = u16(pos)
        require(len >= 2 && pos + len <= bytes.length, "bad segment length")
        val seg = pos + 2
        val segEnd = pos + len
        pos = segEnd
        marker match {
          case m if m == 0xc0 || m == 0xc2 => // SOF0 baseline / SOF2 progressive
            require(comps == null, "multiple SOF frames")
            progressive = m == 0xc2
            require((bytes(seg) & 0xff) == 8, "only 8-bit precision supported")
            height = u16(seg + 1); width = u16(seg + 3)
            require(width > 0 && height > 0, "DNL-deferred or zero dimensions unsupported")
            val nc = bytes(seg + 5) & 0xff
            require(nc == 1 || nc == 3, s"unsupported component count $nc")
            comps = Array.tabulate(nc) { i =>
              val o = seg + 6 + 3 * i
              val hv = bytes(o + 1) & 0xff
              val c = new JpegComp(bytes(o) & 0xff, hv >> 4, hv & 0x0f, bytes(o + 2) & 0xff)
              require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4,
                s"sampling factors ${c.h}x${c.v} out of range")
              c
            }
            hMax = comps.map(_.h).max
            vMax = comps.map(_.v).max
            mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            comps.foreach { c =>
              c.bwP = mcusX * c.h
              c.bhP = mcusY * c.v
              c.bw = (((width * c.h + hMax - 1) / hMax) + 7) / 8
              c.bh = (((height * c.v + vMax - 1) / vMax) + 7) / 8
              c.coefs = new Array[Int](c.bwP * c.bhP * 64)
            }
          case m if m == 0xc1 || m == 0xc3 || (m >= 0xc5 && m <= 0xc7) =>
            throw new IllegalArgumentException(f"non-baseline frame SOF${m - 0xc0}%d unsupported")
          case m if m >= 0xc9 && m <= 0xcb =>
            throw new IllegalArgumentException("arithmetic-coded JPEG unsupported")
          case 0xc4 => // DHT: one or more tables per segment
            var p = seg
            while (p < segEnd) {
              val tc = (bytes(p) & 0xff) >> 4
              val th = bytes(p) & 0x0f
              require(tc <= 1 && th <= 3, "bad DHT class/slot")
              val counts = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
              val n = counts.sum
              require(p + 17 + n <= segEnd, "truncated DHT")
              val syms = Array.tabulate(n)(i => bytes(p + 17 + i) & 0xff)
              val t = new JpegHuffTable(counts, syms)
              if (tc == 0) dcTab(th) = t else acTab(th) = t
              p += 17 + n
            }
          case 0xdb => // DQT: one or more tables per segment
            var p = seg
            while (p < segEnd) {
              val pq = (bytes(p) & 0xff) >> 4
              val tq = bytes(p) & 0x0f
              require(pq <= 1 && tq <= 3, "bad DQT precision/slot")
              val step = if (pq == 0) 1 else 2
              require(p + 1 + 64 * step <= segEnd, "truncated DQT")
              quant(tq) = Array.tabulate(64) { i =>
                if (pq == 0) bytes(p + 1 + i) & 0xff else u16(p + 1 + 2 * i)
              }
              p += 1 + 64 * step
            }
          case 0xdd => // DRI
            restartInterval = u16(seg)
          case 0xdc => throw new IllegalArgumentException("DNL unsupported")
          case 0xda => // SOS: scan header, then the entropy-coded data
            require(comps != null, "SOS before SOF")
            val ns = bytes(seg) & 0xff
            require(ns >= 1 && ns <= comps.length, s"bad scan component count $ns")
            val sc = Array.tabulate(ns) { i =>
              val cid = bytes(seg + 1 + 2 * i) & 0xff
              val sel = bytes(seg + 2 + 2 * i) & 0xff
              val comp = comps.find(_.id == cid).getOrElse(
                throw new IllegalArgumentException(s"SOS references unknown component $cid"))
              comp.td = sel >> 4; comp.ta = sel & 0x0f
              require(quant(comp.tq) != null, s"undefined quant table ${comp.tq}")
              comp
            }
            val ss = bytes(seg + 1 + 2 * ns) & 0xff
            val se = bytes(seg + 2 + 2 * ns) & 0xff
            val aa = bytes(seg + 3 + 2 * ns) & 0xff
            val ah = aa >> 4; val al = aa & 0x0f
            if (!progressive) {
              require(ns == comps.length, "partial-frame scans unsupported in baseline")
              require(ss == 0 && se == 63 && ah == 0 && al == 0,
                "baseline scan must cover the full band at full precision")
              require(scans == 0, "multiple baseline scans unsupported")
            } else {
              if (ss == 0) require(se == 0, "progressive DC scan must have Se=0")
              else {
                require(ns == 1, "progressive AC scans are single-component")
                require(se >= ss && se <= 63, "bad spectral band")
              }
              require(ah <= 13 && al <= 13, "bad successive-approximation bits")
            }
            sc.foreach { c =>
              if (!progressive || (ss == 0 && ah == 0))
                require(dcTab(c.td) != null, s"undefined DC table ${c.td}")
              if (!progressive || ss > 0)
                require(acTab(c.ta) != null, s"undefined AC table ${c.ta}")
            }
            pos = decodeScan(sc, ss, se, ah, al, segEnd)
            scans += 1
          case m if (m >= 0xe0 && m <= 0xef) || m == 0xfe =>
            () // APPn / COM: skip
          case m =>
            throw new IllegalArgumentException(f"unsupported marker FF$m%02X")
        }
      }
    }
    require(comps != null && scans > 0, "no image scan before EOI")

    // all scans are in: dequantize + IDCT every padded block into planes
    comps.foreach { c =>
      c.planeW = c.bwP * 8
      c.plane = new Array[Int](c.planeW * c.bhP * 8)
      val q = quant(c.tq)
      val f = new Array[Double](64)
      var by = 0
      while (by < c.bhP) {
        var bx = 0
        while (bx < c.bwP) {
          val off = (by * c.bwP + bx) * 64
          var i = 0
          while (i < 64) { val z = ZigZag(i); f(z) = c.coefs(off + z).toDouble * q(i); i += 1 }
          val x0 = bx * 8; val y0 = by * 8
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              var s = 0.0
              var v = 0
              while (v < 8) {
                val cy = IdctCos(y)(v)
                var u = 0
                while (u < 8) { s += cy * IdctCos(x)(u) * f(v * 8 + u); u += 1 }
                v += 1
              }
              val px = math.round(s / 4.0).toInt + 128
              c.plane((y0 + y) * c.planeW + (x0 + x)) =
                if (px < 0) 0 else if (px > 255) 255 else px
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
    }

    val rgb = new Array[Byte](width * height * 3)
    if (comps.length == 1) {
      val c = comps(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = c.plane((y * c.v / vMax) * c.planeW + (x * c.h / hMax)).toByte
          val o = (y * width + x) * 3
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      val Array(cy, cb, cr) = comps
      @inline def clamp(d: Double): Byte = {
        val v = math.round(d).toInt
        (if (v < 0) 0 else if (v > 255) 255 else v).toByte
      }
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = cy.plane((y * cy.v / vMax) * cy.planeW + (x * cy.h / hMax)).toDouble
          val pb = cb.plane((y * cb.v / vMax) * cb.planeW + (x * cb.h / hMax)) - 128.0
          val pr = cr.plane((y * cr.v / vMax) * cr.planeW + (x * cr.h / hMax)) - 128.0
          val o = (y * width + x) * 3
          rgb(o) = clamp(yy + 1.402 * pr)
          rgb(o + 1) = clamp(yy - 0.344136 * pb - 0.714136 * pr)
          rgb(o + 2) = clamp(yy + 1.772 * pb)
          x += 1
        }
        y += 1
      }
    }
    RasterImage(width, height, rgb)
  }
}
