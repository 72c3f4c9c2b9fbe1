package graft.dsp

import java.awt.RenderingHints
import java.awt.image.BufferedImage

/** Real JDK-only image kernels (SURVEY §2.2 op 29). Decode is
  * `javax.imageio.ImageIO` — the PNG/BMP/GIF/JPEG readers ship WITH
  * the JDK, so "no codec libraries in this container" stops applying
  * the moment the bytes are a real image format. Encode is a
  * spec-direct 24-bit BMP writer (BITMAPFILEHEADER + BITMAPINFOHEADER
  * + bottom-up 4-byte-padded rows) plus the JDK's PNG encoder, so a
  * round-trip exercises two INDEPENDENT codecs (our writer / the JDK
  * reader; the JDK writer / the JDK reader through real zlib
  * inflate).
  *
  * All raster access uses `Raster.getSample`/`setSample` — raw band
  * values, no ColorModel/sRGB conversion — so gray values survive
  * synth → encode → decode → feature BIT-EXACTLY. That exactness is
  * what lets the DuckDB oracles replay the whole pipeline from the
  * generative pixel formula: any inconsistency between the BMP
  * layout we write, the JDK's decode of it, and the feature kernel
  * shows up as a hash mismatch.
  *
  * Reference scope: xarray_scipy has no image operators; this family
  * is the training-data-pipeline extension (multimodal columns as
  * opaque binary + typed metadata).
  */
object Image {

  // ImageIO defaults to DISK-backed stream caches: every encode/decode
  // creates (and fsyncs) a temp file, which turned the per-row kernels
  // super-linear under load (measured 10x per-doc cost at the 10x
  // corpus). Media rows here are small; cache in memory.
  javax.imageio.ImageIO.setUseCache(false)

  /** W×H gray image with pixel (x,y) = codepoint of
    * text[(off + y*w + x) mod len] — the deterministic synthetic
    * image source the oracles replay in SQL (ASCII text ⇒ codepoint
    * = gray byte). `off` lets one text yield distinct "video" frames.
    */
  def synthGray(text: String, w: Int, h: Int, off: Int): BufferedImage = {
    require(w > 0 && h > 0, s"synthGray: bad dims ${w}x$h")
    require(text.nonEmpty, "synthGray: empty text")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        r.setSample(x, y, 0, text.charAt((off + y * w + x) % text.length).toInt & 0xff)
        x += 1
      }
      y += 1
    }
    img
  }

  /** 24-bit uncompressed BMP bytes: 14-byte file header (the u32 at
    * offset 2 is the total file size — the field [[frames]] demuxes
    * on), 40-byte info header, then bottom-up rows padded to 4 bytes
    * with B=G=R=gray.
    */
  def encodeBmp24(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val stride = (w * 3 + 3) / 4 * 4
    val size = 54 + stride * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(stride * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val r = img.getRaster
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = gray(img, r, x, y).toByte
        b.put(v).put(v).put(v)
        x += 1
      }
      var p = w * 3
      while (p < stride) { b.put(0: Byte); p += 1 }
      y -= 1
    }
    b.array()
  }

  /** PNG bytes via the JDK encoder (8-bit gray for TYPE_BYTE_GRAY —
    * lossless, so decode returns the exact samples).
    */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** JPEG bytes via the JDK encoder at an explicit quality (0-100) —
    * the LOSSY path: decode returns perturbed samples, which is the
    * case perceptual hashing exists for. Gray input stays single-
    * channel (no chroma subsampling ambiguity).
    */
  def encodeJpeg(img: BufferedImage, quality: Int): Array[Byte] = {
    require(quality >= 1 && quality <= 100, s"encodeJpeg: quality $quality")
    val it = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg")
    require(it.hasNext, "encodeJpeg: JDK has no JPEG writer")
    val wr = it.next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality / 100.0f)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      wr.setOutput(ios)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { ios.close(); wr.dispose() }
    baos.toByteArray
  }

  /** ImageIO decode of any JDK-supported format; fails fast on bytes
    * no reader claims instead of returning null downstream.
    */
  def decode(bytes: Array[Byte]): BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "ImageIO found no reader for the supplied bytes")
    img
  }

  /** Gray value of a decoded pixel: the mean over bands (integral for
    * the B=G=R images this pipeline round-trips; the standard cheap
    * gray for genuinely colored input). Band count is per-image
    * constant so this stays branch-free in the hot loop.
    */
  @inline private def gray(img: BufferedImage,
                           r: java.awt.image.Raster, x: Int, y: Int): Int = {
    val nb = r.getNumBands
    if (nb == 1) r.getSample(x, y, 0)
    else {
      var s = 0
      var b = 0
      while (b < nb && b < 3) { s += r.getSample(x, y, b); b += 1 }
      s / math.min(nb, 3)
    }
  }

  /** Decode + per-block gray sums over a gw×gh grid (block (bx,by)
    * covers x ∈ [bx·w/gw, (bx+1)·w/gw) — floor mapping, no divisibility
    * requirement). Sums are integral → oracle compares exactly.
    * Returns (width, height, sums row-major by (by, bx)).
    */
  def blockSums(bytes: Array[Byte], gw: Int, gh: Int): (Int, Int, Array[Long]) = {
    require(gw > 0 && gh > 0, s"blockSums: bad grid ${gw}x$gh")
    val img = decode(bytes)
    val w = img.getWidth
    val h = img.getHeight
    require(w >= gw && h >= gh, s"blockSums: image ${w}x$h smaller than grid")
    val r = img.getRaster
    val sums = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      val by = y * gh / h
      var x = 0
      while (x < w) {
        sums(by * gw + x * gw / w) += gray(img, r, x, y)
        x += 1
      }
      y += 1
    }
    (w, h, sums)
  }

  /** Decode + nearest-neighbor resample to ow×oh: out(x,y) =
    * in(x·w/ow, y·h/oh) (floor mapping — the explicit index rule the
    * oracle replays; Java2D's interpolation hints are deliberately NOT
    * used here because their sub-pixel phase is implementation-defined
    * and would make the result unverifiable). Row-major gray values.
    */
  def resizeNN(bytes: Array[Byte], ow: Int, oh: Int): Array[Int] = {
    require(ow > 0 && oh > 0, s"resizeNN: bad dims ${ow}x$oh")
    val img = decode(bytes)
    val w = img.getWidth
    val h = img.getHeight
    val r = img.getRaster
    val out = new Array[Int](ow * oh)
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        out(y * ow + x) = gray(img, r, x * w / ow, sy)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Difference hash (dHash, the standard perceptual image
    * fingerprint): nearest-neighbor resize to (dw+1)×dh gray, then
    * one bit per output cell — bit (y·dw + x) set iff
    * p[y][x] < p[y][x+1] (brightness gradient direction). Returns the
    * dw·dh bits split into (hi, lo) 32-bit halves, the simhash
    * convention, so downstream hamming/dedup machinery applies
    * unchanged. NN resize (not bilinear) keeps every sampled value an
    * EXACT source pixel — the whole hash is replayable by byte
    * arithmetic, which bilinear's implementation-defined interpolation
    * would break. Default 8×8 = 64 bits.
    */
  def dHash(bytes: Array[Byte], dw: Int = 8, dh: Int = 8): (Long, Long) = {
    require(dw >= 1 && dh >= 1 && dw * dh <= 64,
      s"dHash: bad dims ${dw}x$dh (need dw*dh <= 64)")
    val px = resizeNN(bytes, dw + 1, dh)
    var hi = 0L
    var lo = 0L
    var y = 0
    while (y < dh) {
      var x = 0
      while (x < dw) {
        val b = y * dw + x
        if (px(y * (dw + 1) + x) < px(y * (dw + 1) + x + 1)) {
          if (b < 32) lo |= 1L << b
          else hi |= 1L << (b - 32)
        }
        x += 1
      }
      y += 1
    }
    (hi, lo)
  }

  /** Decode + Java2D bilinear resize (Graphics2D + RenderingHints) —
    * the production smooth-resize path. Interpolated values are
    * implementation-defined at sub-pixel phase, so this variant is
    * golden-tested on invariants (dims, range, constant-image
    * fixed point) rather than oracle-replayed.
    */
  def resizeBilinear(bytes: Array[Byte], ow: Int, oh: Int): BufferedImage = {
    require(ow > 0 && oh > 0, s"resizeBilinear: bad dims ${ow}x$oh")
    val img = decode(bytes)
    val out = new BufferedImage(ow, oh, BufferedImage.TYPE_BYTE_GRAY)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, ow, oh, null)
    } finally g.dispose()
    out
  }

  /** Demux a concatenated-BMP "video" byte stream by REAL container
    * parsing — each frame's length is its BMP file-size field (u32 LE
    * at frame offset 2) — then decode every frame and reduce it to
    * (width, height, gray pixel sum). Malformed streams fail fast
    * (bad magic / size running past the buffer) instead of silently
    * truncating.
    */
  def frames(bytes: Array[Byte]): Array[(Int, Int, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    var o = 0
    while (o < bytes.length) {
      require(o + 6 <= bytes.length && bytes(o) == 'B' && bytes(o + 1) == 'M',
        s"frames: no BMP magic at offset $o")
      val size = (bytes(o + 2) & 0xff) | ((bytes(o + 3) & 0xff) << 8) |
        ((bytes(o + 4) & 0xff) << 16) | ((bytes(o + 5) & 0xff) << 24)
      require(size > 54 && o + size <= bytes.length,
        s"frames: declared size $size at offset $o exceeds buffer ${bytes.length}")
      val img = decode(java.util.Arrays.copyOfRange(bytes, o, o + size))
      val r = img.getRaster
      var s = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { s += gray(img, r, x, y); x += 1 }
        y += 1
      }
      out += ((img.getWidth, img.getHeight, s))
      o += size
    }
    out.toArray
  }
}
