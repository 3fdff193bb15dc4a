package graft.pipeline

/** K8: the notification sink — the reference's templated HTML email built
  * deterministically, transport left external (same split as the K4/K5
  * REST payloads and the K6 GeoServer publish: the engine produces the
  * exact bytes a transport would send).
  *
  * Mirrors `send_notification.py:24-60`: the `notification.html` template
  * has three anchor elements (`h1#header`, `p#info`, `tr#container`);
  * dynamic fragments are APPENDED inside each anchor (BeautifulSoup
  * `.append`), then the whole document is attached as a `text/html` MIME
  * part. The failure wrapper (`data_extraction_v2.py:58-64`) additionally
  * truncates the downstream handoff file FIRST — failure ⇒ downstream
  * no-op (`funcs.py:5-18`, kept in [[Sinks.truncateDownstream]]) — and the
  * success wrapper (`import_biomass.py:81-95`) lists the uploaded rasters.
  */
object Notify {

  /** Append `fragment` inside the element carrying `id="<anchorId>"` —
    * just before its closing tag, i.e. BeautifulSoup's `.append`. The
    * template is trusted, fragments are data: unknown anchors are a loud
    * error, nesting of the SAME tag inside an anchor is not supported
    * (the reference template has none). */
  def injectAt(html: String, anchorId: String, fragment: String): String = {
    val idAttr = s"""id="$anchorId""""
    val at = html.indexOf(idAttr)
    require(at >= 0, s"template has no element with id='$anchorId'")
    val open = html.lastIndexOf('<', at)
    val tag = html.substring(open + 1, at).trim.takeWhile(c => c.isLetterOrDigit)
    val close = html.indexOf(s"</$tag", at)
    require(close > at, s"anchor '$anchorId' (<$tag>) has no closing tag")
    html.substring(0, close) + fragment + html.substring(close)
  }

  /** The reference's three-anchor render: header, info, content. */
  def render(template: String, header: String, info: String, content: String): String =
    injectAt(injectAt(injectAt(template, "header", header), "info", info),
             "container", content)

  /** Full RFC-2045 multipart message, ready for any SMTP transport. The
    * boundary is a deterministic digest of the content so the payload is
    * byte-reproducible (the engine's correctness surface is bytes, not a
    * socket). */
  def mimeMessage(subject: String, from: String, to: Seq[String], html: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest((subject + html).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val boundary = s"===============$digest=="
    val sb = new StringBuilder
    sb ++= s"Content-Type: multipart/mixed; boundary=\"$boundary\"\r\n"
    sb ++= "MIME-Version: 1.0\r\n"
    sb ++= s"Subject: $subject\r\n"
    sb ++= s"From: $from\r\n"
    sb ++= s"To: ${to.mkString(", ")}\r\n"
    sb ++= "\r\n"
    sb ++= s"--$boundary\r\n"
    sb ++= "Content-Type: text/html; charset=\"utf-8\"\r\n"
    sb ++= "Content-Transfer-Encoding: 7bit\r\n"
    sb ++= "MIME-Version: 1.0\r\n"
    sb ++= "\r\n"
    sb ++= html
    sb ++= s"\r\n--$boundary--\r\n"
    sb.toString
  }

  /** The failure notice (`data_extraction_v2.py:58-64`): fixed header/info
    * strings, the error message as a red list item. Callers must truncate
    * the downstream handoff FIRST ([[Sinks.truncateDownstream]]) — that
    * ordering is the contract that makes later stages no-op. */
  def failureEmail(subject: String, message: String, template: String,
                   from: String, to: Seq[String]): String = {
    val header = "Notice: Biomass Data Failed to Update:"
    val info = "I hope this email finds you well. We are reaching out to inform you " +
      "about a failure to update the biomass data. Below, you will find specific " +
      "details about the error."
    val content = s"<p>Error Message:</p><li><span style='color: red;'>$message</span></li>"
    mimeMessage(subject, from, to, render(template, header, info, content))
  }

  /** The success notice (`import_biomass.py:81-95`): the uploaded raster
    * files as list items. */
  def successEmail(subject: String, files: Seq[String], template: String,
                   from: String, to: Seq[String]): String = {
    val header = "Notice: Biomass Data Updated Successfully:"
    val info = "I hope this email finds you well. We are reaching out to inform you " +
      "Biomass data has been updated successfully. Below, you will find specific " +
      "details about the raster files uploaded."
    val content = files.map(f => s"<li>$f</li>").mkString
    mimeMessage(subject, from, to, render(template, header, info, content))
  }

  /** A minimal stand-in for the reference's `notification.html` shape, for
    * tests and environments without the real template: same three anchors,
    * same element kinds. */
  val defaultTemplate: String =
    """<!DOCTYPE html>
      |<html><body>
      |<table role="presentation">
      |<tr><td><h1 id="header" style="font-size: 24px"></h1>
      |<p id="info" style="margin: 0"></p></td></tr>
      |<tr id="container"></tr>
      |</table>
      |</body></html>""".stripMargin
}
