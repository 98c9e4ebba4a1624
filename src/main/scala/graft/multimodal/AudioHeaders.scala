package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM WAV (RIFF/WAVE PCM) header codec — the audio sibling of
  * [[ImageHeaders]]: sample rate, channel count, bit depth, and sample
  * count all live in the fixed `fmt `/`data` chunk headers, so the
  * metadata a crawl pipeline filters and batches on (duration buckets,
  * mono/stereo splits, sample-rate normalization queues) comes from
  * the first ~50 bytes with no codec library and no sample decode —
  * the scale-correct first pass over 100 TB of crawled audio.
  *
  * The encoder builds header-complete streams (real RIFF sizes, PCM
  * `fmt ` chunk, declared `data` size, no sample bytes) for fixture
  * construction; the decoder walks the chunk list per the RIFF spec
  * (chunks are word-aligned: a chunk with an odd size is followed by
  * one pad byte), tolerating unknown chunks (LIST/JUNK/bext metadata
  * precedes `fmt ` in plenty of real files).
  *
  * Format references (public specs): RIFF — Microsoft/IBM Multimedia
  * Programming Interface and Data Specifications 1.0 (1991), chunk
  * structure + word alignment; WAVE PCM — same document, `fmt ` chunk
  * layout (wFormatTag 1 = PCM, little-endian throughout).
  */
object AudioHeaders {

  /** Parsed container metadata. `nSamples` = data-chunk frames
    * (dataSize / blockAlign); duration follows as nSamples/sampleRate.
    */
  final case class AudioMeta(format: String, sampleRate: Int, channels: Int,
                             bitsPerSample: Int, nSamples: Long)

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Header-complete PCM WAV: RIFF header + `fmt ` + `data` chunk
    * header with the size `nSamples` frames WOULD occupy. No sample
    * bytes are emitted — exactly the prefix a header parser may touch.
    */
  def encodeWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                nSamples: Long): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, s"bad wav params $sampleRate/$channels")
    require(bitsPerSample % 8 == 0 && bitsPerSample > 0, s"bad bit depth $bitsPerSample")
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    require(dataSize <= Int.MaxValue.toLong, "fixture data size overflows u32")
    val buf = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(ascii("RIFF")).putInt(36 + dataSize.toInt).put(ascii("WAVE"))
    buf.put(ascii("fmt ")).putInt(16)
      .putShort(1.toShort)                     // wFormatTag: PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign)         // byte rate
      .putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
    buf.put(ascii("data")).putInt(dataSize.toInt)
    buf.array()
  }

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
    ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean = {
    val a = ascii(t)
    b(i) == a(0) && b(i + 1) == a(1) && b(i + 2) == a(2) && b(i + 3) == a(3)
  }

  /** None ⇒ not a parseable PCM WAV header. Walks the chunk list,
    * skipping unknown chunks (word-aligned); succeeds once both the
    * `fmt ` chunk and the `data` chunk HEADER have been seen — the
    * data bytes themselves may be absent or truncated (we only ever
    * read the declared size).
    */
  def decodeWav(b: Array[Byte]): Option[AudioMeta] = {
    if (b.length < 12 + 8 + 16 + 8) return None
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var i = 12
    var sampleRate = -1; var channels = -1; var bits = -1; var blockAlign = -1
    var dataSize = -1L
    while (i + 8 <= b.length && (sampleRate < 0 || dataSize < 0)) {
      val size = u32(b, i + 4)
      if (tag(b, i, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return None
        if (u16(b, i + 8) != 1) return None // PCM only
        channels = u16(b, i + 10)
        sampleRate = u32(b, i + 12).toInt
        blockAlign = u16(b, i + 20)
        bits = u16(b, i + 22)
        if (channels <= 0 || sampleRate <= 0 || blockAlign <= 0 || bits <= 0) return None
      } else if (tag(b, i, "data")) {
        dataSize = size
        // the data bytes need not be present — header-only streams and
        // truncated tails both stop here
        if (sampleRate >= 0) {
          return Some(AudioMeta("wav", sampleRate, channels, bits, dataSize / blockAlign))
        }
      }
      // advance past this chunk's declared body, word-aligned
      val skip = size + (size % 2)
      if (skip > Int.MaxValue - 8L) return None
      i += 8 + skip.toInt
    }
    if (sampleRate >= 0 && dataSize >= 0)
      Some(AudioMeta("wav", sampleRate, channels, bits, dataSize / blockAlign))
    else None
  }
}
