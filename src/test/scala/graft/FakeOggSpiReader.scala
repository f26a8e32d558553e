package graft

import java.io.{File, FileInputStream, InputStream}
import java.net.URL
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream,
  AudioSystem, UnsupportedAudioFileException}
import javax.sound.sampled.spi.AudioFileReader

/** TEST-SCOPE `javax.sound.sampled.spi.AudioFileReader` — the drop-a-jar
  * proof for the compressed-audio seam (r15 verdict item 5): registered via
  * `META-INF/services` on the TEST classpath exactly the way mp3spi or
  * vorbisspi would ride a deployment jar, with ZERO production-code
  * changes. `Multimodal.spiDecodeAudio` reaches it through
  * `AudioSystem.getAudioInputStream`'s ServiceLoader, demonstrating that
  * the verified-absent mp3/ogg closure is pluggable, not just documented.
  *
  * Claims ONLY the `OggS` magic (deliberately NOT `ID3`, which the
  * registry-seam spec uses — the two integration points stay separately
  * observable). Reports an MPEG-style header: 44100 Hz stereo with an
  * UNKNOWN frame length, exercising the `frames = -1 -> 0` normalization
  * in `spiDecodeAudio`.
  */
class FakeOggSpiReader extends AudioFileReader {

  private val Magic = "OggS".getBytes("US-ASCII")

  private val fmt = new AudioFormat(
    new AudioFormat.Encoding("FAKE_OGG"), 44100f,
    AudioSystem.NOT_SPECIFIED, 2, AudioSystem.NOT_SPECIFIED,
    44100f, false)

  /** SPI contract: refuse with UnsupportedAudioFileException and leave the
    * stream where it was (mark/reset) so the next provider can probe.
    */
  private def check(stream: InputStream): Unit = {
    stream.mark(Magic.length)
    val b = new Array[Byte](Magic.length)
    val n = stream.read(b)
    stream.reset()
    if (n != Magic.length || !b.sameElements(Magic))
      throw new UnsupportedAudioFileException("not a fake-ogg payload")
  }

  override def getAudioFileFormat(stream: InputStream): AudioFileFormat = {
    check(stream)
    new AudioFileFormat(new AudioFileFormat.Type("FAKE_OGG", "ogg"), fmt,
      AudioSystem.NOT_SPECIFIED)
  }

  override def getAudioFileFormat(url: URL): AudioFileFormat = {
    val in = new java.io.BufferedInputStream(url.openStream())
    try getAudioFileFormat(in) finally in.close()
  }

  override def getAudioFileFormat(file: File): AudioFileFormat = {
    val in = new java.io.BufferedInputStream(new FileInputStream(file))
    try getAudioFileFormat(in) finally in.close()
  }

  override def getAudioInputStream(stream: InputStream): AudioInputStream = {
    check(stream)
    new AudioInputStream(stream, fmt, AudioSystem.NOT_SPECIFIED)
  }

  override def getAudioInputStream(url: URL): AudioInputStream =
    getAudioInputStream(new java.io.BufferedInputStream(url.openStream()))

  override def getAudioInputStream(file: File): AudioInputStream =
    getAudioInputStream(new java.io.BufferedInputStream(new FileInputStream(file)))
}
