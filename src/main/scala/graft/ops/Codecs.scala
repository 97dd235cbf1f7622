package graft.ops

/** Real, dependency-free binary codecs for the two media containers a
  * bare JVM can honestly parse: 24-bit uncompressed BMP (BITMAPINFOHEADER,
  * bottom-up BGR rows, 4-byte row padding) and 16-bit mono PCM WAV
  * (RIFF/fmt/data chunks, little-endian samples). These upgrade the
  * [[Multimodal]] image/audio paths from header-stub to real pixel and
  * sample work; compressed formats (JPEG/MP4) stay honestly stubbed —
  * no codec libraries ship in this environment.
  *
  * Both formats are published, fixed layouts (Windows BITMAPINFOHEADER
  * and Microsoft/IBM RIFF WAVE), so encode∘decode is byte-exact and
  * the pixel/sample math is oracle-replicable.
  */
object Codecs {

  // ---- BMP (24 bpp, uncompressed) ----

  /** Encode top-down row-major RGB triplets (3 bytes/pixel) as a valid
    * 24-bit BMP: 14-byte file header, 40-byte info header, bottom-up
    * BGR rows padded to 4-byte boundaries.
    */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"encodeBmp: need ${w * h * 3} rgb bytes for ${w}x$h, got ${rgb.length}")
    val stride = ((3 * w + 3) / 4) * 4
    val imageSize = stride * h
    val fileSize = 54 + imageSize
    val bb = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel-data offset
    bb.putInt(40).putInt(w).putInt(h) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(imageSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, palette unused
    var row = h - 1
    while (row >= 0) { // bottom-up
      var x = 0
      while (x < w) {
        val p = (row * w + x) * 3
        bb.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR
        x += 1
      }
      var pad = stride - 3 * w
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      row -= 1
    }
    bb.array()
  }

  /** Decode a 24-bit uncompressed BMP back to (width, height, top-down
    * row-major RGB). Honors the header's pixel-data offset; rejects
    * other depths/compressions rather than mis-reading them.
    */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "decodeBmp: not a BMP")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val offset = bb.getInt(10)
    val w = bb.getInt(18)
    val h = bb.getInt(22)
    val bpp = bb.getShort(28)
    val compression = bb.getInt(30)
    require(bpp == 24 && compression == 0,
      s"decodeBmp: only 24bpp uncompressed supported, got bpp=$bpp compression=$compression")
    require(w > 0 && h > 0, s"decodeBmp: bad dimensions ${w}x$h")
    val stride = ((3 * w + 3) / 4) * 4
    val rgb = new Array[Byte](w * h * 3)
    var row = 0
    while (row < h) {
      val src = offset + (h - 1 - row) * stride // bottom-up in the file
      var x = 0
      while (x < w) {
        val s = src + x * 3
        val d = (row * w + x) * 3
        rgb(d) = bytes(s + 2) // R
        rgb(d + 1) = bytes(s + 1) // G
        rgb(d + 2) = bytes(s) // B
        x += 1
      }
      row += 1
    }
    (w, h, rgb)
  }

  /** Nearest-neighbor resample of top-down RGB pixels — the real
    * resize kernel: out(x,y) = in(x*srcW/dstW, y*srcH/dstH).
    */
  def resizeRgb(srcW: Int, srcH: Int, rgb: Array[Byte],
      dstW: Int, dstH: Int): Array[Byte] = {
    require(dstW > 0 && dstH > 0, s"resizeRgb: bad target ${dstW}x$dstH")
    val out = new Array[Byte](dstW * dstH * 3)
    var y = 0
    while (y < dstH) {
      val sy = y * srcH / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * srcW / dstW
        val s = (sy * srcW + sx) * 3
        val d = (y * dstW + x) * 3
        out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- Y4M (YUV4MPEG2 uncompressed video, C420) ----

  /** Encode 4:2:0 frames as YUV4MPEG2: the plain-text stream header
    * (`YUV4MPEG2 W.. H.. F.. C420`), then `FRAME\n` + w·h luma bytes +
    * two (w/2)·(h/2) chroma planes per frame — the standard
    * uncompressed interchange format of the video tool ecosystem
    * (mjpegtools/ffmpeg/x264 all speak it), and the one video container
    * a bare JVM can honestly write.
    */
  def encodeY4m(w: Int, h: Int, fps: String,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
      s"encodeY4m: C420 needs even dimensions, got ${w}x$h")
    val frameSize = w * h + 2 * (w / 2) * (h / 2)
    frames.foreach(f => require(f.length == frameSize,
      s"encodeY4m: frame must be $frameSize bytes, got ${f.length}"))
    val header = s"YUV4MPEG2 W$w H$h F$fps Ip A1:1 C420\n".getBytes("ISO-8859-1")
    val mark = "FRAME\n".getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames.length * (mark.length + frameSize))
    out.write(header)
    frames.foreach { f => out.write(mark); out.write(f) }
    out.toByteArray
  }

  /** Decode a C420 YUV4MPEG2 stream to (width, height, frames). Frame
    * parameter lines (`FRAME` followed by optional parameters before
    * the newline) are honored; non-C420 color spaces are rejected
    * rather than mis-sliced.
    */
  def decodeY4m(bytes: Array[Byte]): (Int, Int, Seq[Array[Byte]]) = {
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "decodeY4m: missing stream header")
    val header = new String(bytes, 0, nl, "ISO-8859-1")
    require(header.startsWith("YUV4MPEG2"), "decodeY4m: not a Y4M stream")
    val params = header.split(" ").drop(1)
    def param(p: Char): Option[String] =
      params.find(_.headOption.contains(p)).map(_.tail)
    val w = param('W').getOrElse(sys.error("decodeY4m: no width")).toInt
    val h = param('H').getOrElse(sys.error("decodeY4m: no height")).toInt
    val cs = param('C').getOrElse("420")
    require(cs.startsWith("420"), s"decodeY4m: only C420 supported, got C$cs")
    val frameSize = w * h + 2 * (w / 2) * (h / 2)
    val frames = Seq.newBuilder[Array[Byte]]
    var pos = nl + 1
    while (pos < bytes.length) {
      var lineEnd = pos
      while (lineEnd < bytes.length && bytes(lineEnd) != '\n') lineEnd += 1
      val line = new String(bytes, pos, lineEnd - pos, "ISO-8859-1")
      require(line.startsWith("FRAME"), s"decodeY4m: expected FRAME marker, got: $line")
      require(lineEnd + 1 + frameSize <= bytes.length, "decodeY4m: truncated frame")
      frames += java.util.Arrays.copyOfRange(bytes, lineEnd + 1, lineEnd + 1 + frameSize)
      pos = lineEnd + 1 + frameSize
    }
    (w, h, frames.result())
  }

  // ---- WAV (PCM16 mono) ----

  /** Encode 16-bit mono PCM samples as a canonical 44-byte-header WAV. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"encodeWav: bad sample rate $sampleRate")
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + dataSize)
      .put("WAVE".getBytes("ISO-8859-1"))
    bb.put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
    bb.put("data".getBytes("ISO-8859-1")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** Decode a PCM16 mono WAV to (sampleRate, samples). Walks the chunk
    * list (fmt /data may be separated by LIST/fact chunks in the wild)
    * rather than assuming the canonical 44-byte layout.
    */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "ISO-8859-1") == "RIFF" &&
      new String(bytes, 8, 4, "ISO-8859-1") == "WAVE", "decodeWav: not a WAV")
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (sampleRate < 0 || samples == null)) {
      val id = new String(bytes, pos, 4, "ISO-8859-1")
      val size = bb.getInt(pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"decodeWav: truncated chunk $id")
      id match {
        case "fmt " =>
          val fmt = bb.getShort(pos + 8)
          val channels = bb.getShort(pos + 10)
          val bits = bb.getShort(pos + 22)
          require(fmt == 1 && channels == 1 && bits == 16,
            s"decodeWav: only PCM16 mono supported (fmt=$fmt ch=$channels bits=$bits)")
          sampleRate = bb.getInt(pos + 12)
        case "data" =>
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = bb.getShort(pos + 8 + i * 2); i += 1 }
        case _ => () // skip LIST/fact/etc.
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && samples != null, "decodeWav: missing fmt /data chunk")
    (sampleRate, samples)
  }
}
