package graft.sources

/** Minimal RIFF/AVI container codec, pure JDK.
  *
  * The reference dispatches parsing by modality
  * (/root/reference/src/parsers.py:17-29) but, like the JDK, ships no
  * video codec; SURVEY's multimodal north star names video a first-class
  * modality anyway. This closes the gap JDK-only: an AVI file is a RIFF
  * tree — `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
  * LIST('movi' 00dc...) idx1)` — and for the two classic stream formats
  * the per-frame payloads are decodable without native code:
  *
  *   - MJPEG (`strh.fccHandler = 'MJPG'`, `00dc` chunks): each chunk is
  *     a complete JPEG; `ImageIO.read` decodes it (JPEG is in the JDK).
  *   - Uncompressed DIB (`'DIB '`, `00db` chunks, `strf.biCompression =
  *     BI_RGB`): each chunk is bottom-up BGR rows, 4-byte-aligned —
  *     [[AviCodec.dibPixel]] reads pixels straight out of the buffer.
  *
  * The builder writes a spec-complete file (headers, word-aligned
  * chunks, `idx1` keyframe index) so the walker is exercised against a
  * real container layout, not a bespoke framing. All integers are
  * little-endian per RIFF.
  */
object AviCodec {

  /** One parsed video stream: header facts + raw per-frame payloads. */
  case class AviStream(width: Int, height: Int, handler: String,
                       compression: Int, frames: Vector[Array[Byte]])

  private val KEYFRAME_FLAG = 0x10 // AVIIF_KEYFRAME
  private val HASINDEX_FLAG = 0x10 // AVIF_HASINDEX

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def fcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }

  /** `fourcc size data [pad]` — RIFF chunks are word-aligned; the pad
    * byte is NOT counted in `size`. */
  private def chunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fcc(fourcc) ++ le32(data.length) ++ data ++ pad
  }

  private def list(listType: String, children: Array[Byte]): Array[Byte] =
    fcc("LIST") ++ le32(4 + children.length) ++ fcc(listType) ++ children

  /** Build a complete single-video-stream AVI. `handler` is `"MJPG"`
    * (frames are whole JPEG files) or `"DIB "` (frames are bottom-up
    * BGR DIB buffers from [[buildDibFrame]]). */
  def buildAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
               handler: String, fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "an AVI stream needs at least one frame")
    val maxFrame = frames.map(_.length).max
    val chunkId = if (handler == "MJPG") "00dc" else "00db"
    val compression =
      if (handler == "MJPG") // biCompression carries the codec fourcc
        ('M'.toInt) | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)
      else 0 // BI_RGB

    val avih = chunk("avih",
      le32(1000000 / fps) ++ le32(maxFrame * fps) ++ le32(0) ++
      le32(HASINDEX_FLAG) ++ le32(frames.length) ++ le32(0) ++ le32(1) ++
      le32(maxFrame) ++ le32(w) ++ le32(h) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      fcc("vids") ++ fcc(handler) ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++ le32(frames.length) ++
      le32(maxFrame) ++ le32(10000) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf", // BITMAPINFOHEADER
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(compression) ++ le32(dibStride(w) * h) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))

    val moviChunks = frames.map(f => chunk(chunkId, f))
    val movi = list("movi", moviChunks.toArray.flatten)

    // idx1 offsets are relative to the 'movi' fourcc (the convention
    // every player accepts): first chunk sits at offset 4
    val offsets = moviChunks.scanLeft(4)((off, c) => off + c.length)
    val idxEntries = frames.zip(offsets).flatMap { case (f, off) =>
      fcc(chunkId) ++ le32(KEYFRAME_FLAG) ++ le32(off) ++ le32(f.length)
    }
    val idx1 = chunk("idx1", idxEntries.toArray)

    val body = fcc("AVI ") ++ hdrl ++ movi ++ idx1
    fcc("RIFF") ++ le32(body.length) ++ body
  }

  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
    ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def rdFcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Walk the RIFF tree and return header facts + frame payloads from
    * the `movi` list (in stream order; `rec ` sub-lists are descended
    * into, as interleaved AVIs require). Tolerates trailing junk and
    * unknown chunks — exactly what a scanner ingesting crawled files
    * needs. Throws on a non-AVI buffer. */
  def parseAvi(bytes: Array[Byte]): AviStream = {
    require(bytes.length >= 12 && rdFcc(bytes, 0) == "RIFF" &&
            rdFcc(bytes, 8) == "AVI ", "not a RIFF/AVI buffer")
    var width = 0; var height = 0; var handler = ""; var compression = 0
    val frames = Vector.newBuilder[Array[Byte]]

    def isFrameChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
      (id.endsWith("dc") || id.endsWith("db") || id.endsWith("dd"))

    // walk chunks in [off, end); inMovi flags whether frame chunks here
    // belong to the video stream
    def walk(off0: Int, end: Int, inMovi: Boolean): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val id = rdFcc(bytes, off)
        val size = rdLe32(bytes, off + 4)
        val dataOff = off + 8
        if (size < 0 || dataOff + size > end) return // truncated: stop
        id match {
          case "LIST" =>
            val listType = rdFcc(bytes, dataOff)
            walk(dataOff + 4, dataOff + size,
                 inMovi || listType == "movi" || listType == "rec ")
          case "strh" =>
            if (rdFcc(bytes, dataOff) == "vids" && handler.isEmpty)
              handler = rdFcc(bytes, dataOff + 4)
          case "strf" =>
            if (width == 0 && size >= 40) {
              width = rdLe32(bytes, dataOff + 4)
              height = rdLe32(bytes, dataOff + 8)
              compression = rdLe32(bytes, dataOff + 16)
            }
          case other if inMovi && isFrameChunk(other) =>
            frames += java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + size)
          case _ => () // unknown chunk: skip
        }
        off = dataOff + size + (size & 1) // word alignment
      }
    }
    walk(12, bytes.length, inMovi = false)
    AviStream(width, height, handler.trim, compression, frames.result())
  }

  /** DIB rows are padded to 4-byte boundaries. */
  def dibStride(w: Int): Int = ((w * 3) + 3) / 4 * 4

  /** Build one uncompressed 24-bit DIB frame (bottom-up BGR, padded
    * rows) from a grayscale pixel function — the layout `00db` chunks
    * carry in a `'DIB '` AVI. */
  def buildDibFrame(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val stride = dibStride(w)
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val row = (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        val v = (gray(y, x) & 0xff).toByte
        out(row + x * 3) = v     // B
        out(row + x * 3 + 1) = v // G
        out(row + x * 3 + 2) = v // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Read the gray value (blue channel) of pixel (y,x) from a bottom-up
    * 24-bit DIB frame buffer. */
  def dibPixel(frame: Array[Byte], w: Int, h: Int, y: Int, x: Int): Int =
    frame((h - 1 - y) * dibStride(w) + x * 3) & 0xff
}
