package graft.io

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{Deflater, Inflater}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** PDF document structure with text extraction — the Document pillar of the
  * reference (`src/bears/reader/document/pdf/FitzPdfReader.py` returns
  * `Pdf(pages=[PdfPage(text, images)])` via PyMuPDF). No PDF library exists
  * in a bare JVM, so this is a self-contained extractor over the public PDF
  * 1.x format: content streams are located by `stream`/`endstream` framing,
  * FlateDecode payloads inflate through `java.util.zip`, and page text is
  * the concatenation of string literals shown by `Tj`/`TJ` operators inside
  * `BT`…`ET` text blocks — the same operator set FitzPdfReader's get_text
  * walks. Heuristic by design (no xref/object-graph walk): each text-bearing
  * content stream in file order is one page, which holds for the vast
  * majority of single-content-stream-per-page PDFs and for everything
  * [[synthesize]] emits.
  *
  * Scale shape mirrors [[graft.ops.Multimodal.decodeImages]]: bytes stay an
  * opaque binary column, extraction runs per-partition `mapPartitions` with
  * a typed Encoder, derived rows are small fixed-width (path, page, text).
  */
object Pdf {

  final case class PdfPage(index: Int, text: String)
  final case class PdfDoc(pages: Seq[PdfPage])
  final case class PdfPageRow(path: String, page: Int, text: String)

  /** Escape the three PDF string-literal metacharacters. Safe on UTF-8 text:
    * `\ ( )` are ASCII and never occur inside multi-byte sequences.
    */
  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** Minimal deterministic PDF writer: one Catalog, one Pages node, one
    * Page + FlateDecode content stream per entry of `pageTexts`. Used by the
    * corpus query and specs (golden input the extractor must round-trip);
    * wild PDFs go through [[extract]]'s same Flate path.
    */
  def synthesize(pageTexts: Seq[String], compress: Boolean = true): Array[Byte] = {
    // fail loud, not a mid-escape NPE: a null page is a caller bug (a null
    // document has no PDF — filter upstream)
    require(pageTexts.forall(_ != null), "Pdf.synthesize: null page text")
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val kidRefs = pageTexts.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    w(s"2 0 obj << /Type /Pages /Kids [$kidRefs] /Count ${pageTexts.size} >> endobj\n")
    pageTexts.zipWithIndex.foreach { case (text, i) =>
      val pageObj = 3 + 2 * i
      val contentObj = pageObj + 1
      w(s"$pageObj 0 obj << /Type /Page /Parent 2 0 R /Contents $contentObj 0 R >> endobj\n")
      val content = s"BT /F1 12 Tf 72 720 Td (${escape(text)}) Tj ET".getBytes(UTF_8)
      val payload = if (compress) deflate(content) else content
      val filter = if (compress) " /Filter /FlateDecode" else ""
      w(s"$contentObj 0 obj << /Length ${payload.length}$filter >> stream\n")
      out.write(payload)
      w("\nendstream endobj\n")
    }
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  private def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def tryInflate(bytes: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) throw new java.util.zip.DataFormatException("stalled")
        out.write(buf, 0, n)
      }
      val ok = inf.finished()
      inf.end()
      if (ok) Some(out.toByteArray) else None
    } catch { case _: Exception => None }

  /** Parse PDF bytes into pages of extracted text. Unknown/undecodable
    * streams and streams without text operators are skipped, so image-only
    * pages simply don't surface (documented heuristic).
    */
  def extract(bytes: Array[Byte]): PdfDoc = {
    val raw = new String(bytes, ISO_8859_1) // byte-preserving scan
    val pages = scala.collection.mutable.ArrayBuffer.empty[PdfPage]
    var from = 0
    while ({ val s = raw.indexOf("stream", from); s >= 0 } ) {
      val s = raw.indexOf("stream", from)
      // payload starts after "stream" + EOL (PDF allows \r\n or \n)
      var start = s + "stream".length
      if (start < raw.length && raw.charAt(start) == '\r') start += 1
      if (start < raw.length && raw.charAt(start) == '\n') start += 1
      val e = raw.indexOf("endstream", start)
      if (e < 0) { from = raw.length }
      else {
        val payload = java.util.Arrays.copyOfRange(bytes, start, e)
        val content = tryInflate(payload).getOrElse(payload)
        val text = textShown(new String(content, ISO_8859_1))
        if (text.nonEmpty) pages += PdfPage(pages.size, text)
        from = e + "endstream".length
      }
    }
    PdfDoc(pages.toSeq)
  }

  /** Concatenate the strings shown by Tj/TJ inside BT…ET blocks. String
    * literals honor `\(`/`\)`/`\\` and balanced nested parens (PDF spec
    * §7.3.4.2); captured bytes re-decode as UTF-8.
    */
  private[graft] def textShown(content: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = content.length
    var inText = false
    while (i < n) {
      if (!inText && i + 2 <= n && content.startsWith("BT", i)) { inText = true; i += 2 }
      else if (inText && i + 2 <= n && content.startsWith("ET", i)) { inText = false; i += 2 }
      else if (inText && content.charAt(i) == '(') {
        val lit = new StringBuilder
        var depth = 1
        var j = i + 1
        while (j < n && depth > 0) {
          val c = content.charAt(j)
          if (c == '\\' && j + 1 < n) {
            val e = content.charAt(j + 1)
            lit.append(e match {
              case 'n' => '\n'; case 'r' => '\r'; case 't' => '\t'; case other => other
            })
            j += 2
          } else if (c == '(') { depth += 1; lit.append(c); j += 1 }
          else if (c == ')') { depth -= 1; if (depth > 0) lit.append(c); j += 1 }
          else { lit.append(c); j += 1 }
        }
        sb.append(new String(lit.toString.getBytes(ISO_8859_1), UTF_8))
        i = j
      } else i += 1
    }
    sb.toString
  }

  /** Distributed page extraction over an asset column
    * ([[graft.ops.Multimodal.assetStruct]] shape): one output row per
    * extracted page — (path, page index, text).
    */
  def extractPages(assets: DataFrame, assetCol: String): Dataset[PdfPageRow] = {
    implicit val enc: org.apache.spark.sql.Encoder[PdfPageRow] = Encoders.product[PdfPageRow]
    assets.select(col(s"$assetCol.path"), col(s"$assetCol.data"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val path = r.getString(0)
          val doc = extract(r.getAs[Array[Byte]](1))
          doc.pages.map(p => PdfPageRow(path, p.index, p.text))
        }
      }
  }
}
