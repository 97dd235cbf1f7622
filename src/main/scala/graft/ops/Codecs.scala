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
