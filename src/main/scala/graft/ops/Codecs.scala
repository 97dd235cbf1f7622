package graft.ops

/** Real, dependency-free binary codecs for the media containers a bare
  * JVM can honestly parse: 24-bit uncompressed BMP (BITMAPINFOHEADER,
  * bottom-up BGR rows, 4-byte row padding), 8-bit PNG (zlib inflate +
  * CRC32 from `java.util.zip`, full five-filter reconstruction,
  * gray/RGB/RGBA color types), and 16-bit mono PCM WAV (RIFF/fmt/data
  * chunks, little-endian samples). These upgrade the [[Multimodal]]
  * image/audio paths from header-stub to real pixel and sample work;
  * formats needing codecs the JDK lacks (JPEG/MP4) stay honestly
  * stubbed.
  *
  * All three are published, fixed layouts (Windows BITMAPINFOHEADER,
  * RFC 2083 PNG, Microsoft/IBM RIFF WAVE), so encode∘decode is exact
  * and the pixel/sample math is oracle-replicable.
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

  // ---- PNG (8-bit non-interlaced; zlib/CRC32 ship in the JDK) ----

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val tagB = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val bb = java.nio.ByteBuffer.allocate(12 + data.length) // big-endian
    bb.putInt(data.length).put(tagB).put(data)
    val crc = new java.util.zip.CRC32
    crc.update(tagB); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode top-down RGB as a real 8-bit truecolor PNG (deflated IDAT,
    * CRC'd chunks). `filterType` picks the per-scanline filter (0 None,
    * 1 Sub, 2 Up, 3 Average, 4 Paeth) — every decoder path is thereby
    * testable against our own encoder; real encoders choose per row,
    * real decoders must handle all five.
    */
  def encodePng(w: Int, h: Int, rgb: Array[Byte], filterType: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"encodePng: need ${w * h * 3} rgb bytes for ${w}x$h, got ${rgb.length}")
    require(filterType >= 0 && filterType <= 4,
      s"encodePng: bad filter $filterType")
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte) // depth 8, truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val off = y * (stride + 1)
      raw(off) = filterType.toByte
      var i = 0
      while (i < stride) {
        val x = rgb(y * stride + i) & 0xff
        val left = if (i >= 3) rgb(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) rgb((y - 1) * stride + i - 3) & 0xff else 0
        val pred = filterType match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(off + 1 + i) = ((x - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val d = new java.util.zip.Deflater()
    val idat = try {
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig); out.write(pngChunk("IHDR", ihdr))
    out.write(pngChunk("IDAT", idat)); out.write(pngChunk("IEND", Array.empty))
    out.toByteArray
  }

  /** Decode an 8-bit non-interlaced PNG (truecolor, truecolor+alpha,
    * or grayscale) to (width, height, top-down RGB): chunk walk with
    * CRC verification, multi-IDAT concatenation, zlib inflate, and the
    * full five-filter reconstruction (None/Sub/Up/Average/Paeth).
    * Alpha is dropped; gray replicates. Palette/interlaced/16-bit
    * images are rejected rather than mis-read.
    */
  def decodePng(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length > 8 && PngSig.indices.forall(i => bytes(i) == PngSig(i)),
      "decodePng: not a PNG")
    val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    bb.position(8)
    var w = 0; var h = 0; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && bb.remaining() >= 12) {
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining() - 8, s"decodePng: bad chunk length $len")
      val tagB = new Array[Byte](4); bb.get(tagB)
      val tag = new String(tagB, java.nio.charset.StandardCharsets.US_ASCII)
      val data = new Array[Byte](len); bb.get(data)
      val crcStored = bb.getInt
      val crc = new java.util.zip.CRC32
      crc.update(tagB); crc.update(data)
      require(crc.getValue.toInt == crcStored, s"decodePng: CRC mismatch in $tag")
      tag match {
        case "IHDR" =>
          val ib = java.nio.ByteBuffer.wrap(data)
          w = ib.getInt; h = ib.getInt
          val depth = ib.get() & 0xff
          colorType = ib.get() & 0xff
          val interlace = data(12) & 0xff
          require(w > 0 && h > 0, s"decodePng: bad dimensions ${w}x$h")
          require(depth == 8, s"decodePng: only 8-bit supported, got $depth")
          require(colorType == 0 || colorType == 2 || colorType == 6,
            s"decodePng: unsupported color type $colorType (palette needs PLTE)")
          require(interlace == 0, "decodePng: interlaced PNGs unsupported")
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
    }
    require(colorType >= 0 && idat.size > 0, "decodePng: missing IHDR/IDAT")
    val channels = colorType match { case 0 => 1; case 2 => 3; case 6 => 4 }
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (!inf.finished() && off < raw.length) {
        val n = inf.inflate(raw, off, raw.length - off)
        require(n > 0 || inf.finished(), "decodePng: truncated IDAT stream")
        off += n
      }
      require(off == raw.length, s"decodePng: expected ${raw.length} raw bytes, got $off")
    } finally inf.end()
    // reconstruct in place into prev/cur scanline buffers
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val off = y * (stride + 1)
      val f = raw(off) & 0xff
      require(f <= 4, s"decodePng: bad filter type $f on row $y")
      var i = 0
      while (i < stride) {
        val x = raw(off + 1 + i) & 0xff
        val left = if (i >= channels) cur(i - channels) else 0
        val up = if (y > 0) prev(i) else 0
        val ul = if (y > 0 && i >= channels) prev(i - channels) else 0
        cur(i) = f match {
          case 0 => x
          case 1 => (x + left) & 0xff
          case 2 => (x + up) & 0xff
          case 3 => (x + (left + up) / 2) & 0xff
          case 4 => (x + paeth(left, up, ul)) & 0xff
        }
        i += 1
      }
      var px = 0
      while (px < w) {
        val d = (y * w + px) * 3
        colorType match {
          case 0 =>
            val g = cur(px).toByte
            rgb(d) = g; rgb(d + 1) = g; rgb(d + 2) = g
          case 2 =>
            rgb(d) = cur(px * 3).toByte
            rgb(d + 1) = cur(px * 3 + 1).toByte
            rgb(d + 2) = cur(px * 3 + 2).toByte
          case 6 =>
            rgb(d) = cur(px * 4).toByte
            rgb(d + 1) = cur(px * 4 + 1).toByte
            rgb(d + 2) = cur(px * 4 + 2).toByte
        }
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    (w, h, rgb)
  }

  /** Format-sniffing image decode: BMP (`BM`), PNG (signature), or GIF
    * (`GIF8`) to (width, height, top-down RGB, format tag).
    */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Byte], String) = {
    require(bytes.length >= 8, "decodeImage: too short")
    if (bytes(0) == 'B' && bytes(1) == 'M') {
      val (w, h, rgb) = decodeBmp(bytes); (w, h, rgb, "bmp")
    } else if (PngSig.indices.forall(i => bytes(i) == PngSig(i))) {
      val (w, h, rgb) = decodePng(bytes); (w, h, rgb, "png")
    } else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8') {
      val (w, h, rgb) = decodeGif(bytes); (w, h, rgb, "gif")
    } else throw new IllegalArgumentException(
      "decodeImage: unrecognized image format (BMP, PNG, GIF supported)")
  }

  /** Re-encode RGB in the named format ([[decodeImage]]'s tag). GIF
    * re-derives the palette from the distinct colors (nearest-neighbor
    * resample of a palette image never invents colors, so round trips
    * stay exact); >256 distinct colors can't be a GIF and is rejected.
    */
  def encodeImage(w: Int, h: Int, rgb: Array[Byte], format: String): Array[Byte] =
    format match {
      case "bmp" => encodeBmp(w, h, rgb)
      case "png" => encodePng(w, h, rgb)
      case "gif" =>
        val colorOf = new java.util.LinkedHashMap[Int, Int]()
        var i = 0
        while (i < w * h) {
          val c = ((rgb(i * 3) & 0xff) << 16) | ((rgb(i * 3 + 1) & 0xff) << 8) |
            (rgb(i * 3 + 2) & 0xff)
          if (!colorOf.containsKey(c)) colorOf.put(c, colorOf.size)
          i += 1
        }
        require(colorOf.size <= 256,
          s"encodeImage: ${colorOf.size} distinct colors exceed a GIF palette")
        val palette = new Array[Array[Int]](colorOf.size)
        colorOf.forEach((c, idx) =>
          palette(idx) = Array((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff))
        val indices = new Array[Byte](w * h)
        i = 0
        while (i < w * h) {
          val c = ((rgb(i * 3) & 0xff) << 16) | ((rgb(i * 3 + 1) & 0xff) << 8) |
            (rgb(i * 3 + 2) & 0xff)
          indices(i) = colorOf.get(c).toByte
          i += 1
        }
        encodeGif(w, h, palette, indices)
      case other => throw new IllegalArgumentException(
        s"encodeImage: unknown format $other")
    }

  // ---- GIF (87a, LZW-compressed, global palette) ----

  /** Encode palette indices as a valid GIF87a: header, logical screen
    * descriptor, global color table (padded to a power of two), one
    * image descriptor, LZW-compressed data. The LZW stream grows its
    * string table normally but emits a CLEAR whenever the next code
    * would force a width increase ("clear-early" — spec-legal, keeps
    * the encoder simple; the DECODER handles full variable-width
    * streams, unit-tested against a hand-built width-crossing stream).
    */
  def encodeGif(w: Int, h: Int, palette: Array[Array[Int]],
      indices: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0 && indices.length == w * h,
      s"encodeGif: need ${w * h} indices for ${w}x$h, got ${indices.length}")
    require(palette.nonEmpty && palette.length <= 256 &&
      palette.forall(_.length == 3), "encodeGif: bad palette")
    require(indices.forall(i => (i & 0xff) < palette.length),
      "encodeGif: index outside palette")
    var palBits = 1
    while ((1 << palBits) < palette.length) palBits += 1
    val palSize = 1 << palBits
    val minCode = math.max(2, palBits)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0x80 | (palBits - 1)) // global table, 2^palBits entries
    out.write(0); out.write(0) // background, aspect
    var p = 0
    while (p < palSize) {
      val c = if (p < palette.length) palette(p) else Array(0, 0, 0)
      out.write(c(0)); out.write(c(1)); out.write(c(2))
      p += 1
    }
    out.write(0x2C) // image descriptor
    out.write(0); out.write(0); out.write(0); out.write(0) // left, top
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(0) // no local table, not interlaced
    out.write(minCode)
    // LZW, clear-early: width stays minCode+1 throughout
    val clear = 1 << minCode
    val end = clear + 1
    val width = minCode + 1
    val maxBeforeClear = (1 << width) - 1
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nAcc = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << nAcc; nAcc += width
      while (nAcc >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nAcc -= 8 }
    }
    var table = scala.collection.mutable.HashMap.empty[String, Int]
    var nextCode = end + 1
    def resetTable(): Unit = { table = scala.collection.mutable.HashMap.empty; nextCode = end + 1 }
    put(clear)
    var cur = new java.lang.StringBuilder().append((indices(0) & 0xff).toChar).toString
    var i = 1
    while (i < indices.length) {
      val c = (indices(i) & 0xff).toChar
      val ext = cur + c
      if (table.contains(ext)) cur = ext
      else {
        put(if (cur.length == 1) cur.charAt(0).toInt else table(cur))
        if (nextCode >= maxBeforeClear) { put(clear); resetTable() }
        else { table(ext) = nextCode; nextCode += 1 }
        cur = c.toString
      }
      i += 1
    }
    put(if (cur.length == 1) cur.charAt(0).toInt else table(cur))
    put(end)
    if (nAcc > 0) bits.write((acc & 0xff).toInt)
    val data = bits.toByteArray
    var off = 0
    while (off < data.length) { // 255-byte sub-blocks
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n); off += n
    }
    out.write(0) // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Decode a GIF87a/89a first frame to (width, height, top-down RGB):
    * global color table, extension-block skipping, and a full
    * variable-width LZW decoder (table growth, width bumps at
    * `nextCode == 2^width` up to 12 bits, CLEAR resets, the
    * prev+prev[0] case for not-yet-defined codes). Interlaced and
    * local-palette images are rejected rather than mis-read.
    */
  def decodeGif(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length > 13 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F', "decodeGif: not a GIF")
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
    val sw = u16(6); val sh = u16(8)
    val flags = u8(10)
    require((flags & 0x80) != 0, "decodeGif: global color table required")
    val palSize = 1 << ((flags & 7) + 1)
    val pal = Array.tabulate(palSize)(p =>
      Array(u8(13 + p * 3), u8(13 + p * 3 + 1), u8(13 + p * 3 + 2)))
    var pos = 13 + palSize * 3
    // skip extension blocks to the first image descriptor
    while (u8(pos) == 0x21) {
      pos += 2 // introducer + label
      while (u8(pos) != 0) pos += u8(pos) + 1
      pos += 1
    }
    require(u8(pos) == 0x2C, s"decodeGif: expected image descriptor at $pos")
    val w = u16(pos + 5); val h = u16(pos + 7)
    val iflags = u8(pos + 9)
    require((iflags & 0x80) == 0, "decodeGif: local color tables unsupported")
    require((iflags & 0x40) == 0, "decodeGif: interlaced GIFs unsupported")
    require(w == sw && h == sh, "decodeGif: sub-rectangle frames unsupported")
    pos += 10
    val minCode = u8(pos); pos += 1
    val data = new java.io.ByteArrayOutputStream()
    while (u8(pos) != 0) {
      val n = u8(pos)
      data.write(bytes, pos + 1, n)
      pos += n + 1
    }
    val stream = data.toByteArray
    val clear = 1 << minCode
    val end = clear + 1
    var width = minCode + 1
    var acc = 0L; var nAcc = 0; var sp = 0
    def read(): Int = {
      while (nAcc < width) {
        require(sp < stream.length, "decodeGif: truncated LZW stream")
        acc |= (stream(sp) & 0xffL) << nAcc; nAcc += 8; sp += 1
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>= width; nAcc -= width
      v
    }
    val table = new Array[Array[Byte]](4096)
    var nextCode = 0
    def reset(): Unit = {
      var i = 0
      while (i < clear) { table(i) = Array(i.toByte); i += 1 }
      nextCode = end + 1
      width = minCode + 1
    }
    reset()
    val out = new java.io.ByteArrayOutputStream(w * h)
    var prev: Array[Byte] = null
    var done = false
    while (!done) {
      val code = read()
      if (code == clear) { reset(); prev = null }
      else if (code == end) done = true
      else {
        val entry: Array[Byte] =
          if (code < nextCode && table(code) != null) table(code)
          else {
            require(code == nextCode && prev != null,
              s"decodeGif: invalid code $code (next $nextCode)")
            prev :+ prev(0)
          }
        out.write(entry, 0, entry.length)
        if (prev != null && nextCode < 4096) {
          table(nextCode) = prev :+ entry(0)
          nextCode += 1
          if (nextCode == (1 << width) && width < 12) width += 1
        }
        prev = entry
      }
    }
    val idx = out.toByteArray
    require(idx.length >= w * h, s"decodeGif: got ${idx.length} of ${w * h} pixels")
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val p = idx(i) & 0xff
      require(p < palSize, s"decodeGif: index $p outside palette")
      rgb(i * 3) = pal(p)(0).toByte
      rgb(i * 3 + 1) = pal(p)(1).toByte
      rgb(i * 3 + 2) = pal(p)(2).toByte
      i += 1
    }
    (w, h, rgb)
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
