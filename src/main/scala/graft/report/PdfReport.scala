package graft.report

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** The reference's two-page PDF policy report
  * (`/root/reference/report_generator.py:21-153`) emitted by a minimal
  * self-contained PDF 1.4 writer — ~uncompressed text/vector content
  * streams, Helvetica base-14 fonts, hand-built xref. No PDF library
  * ships in this environment and the report needs exactly three
  * primitives: text runs, stroked/filled paths, and a table grid.
  *
  * Page 1 (cover): title, subtitle, country/antigen/date — mirrors
  * `_build_cover`. Page 2 (body): executive summary, vector trend
  * chart (line + dashed campaign marker), top-20 data table, footer —
  * mirrors `_build_body`. Driver-side presentation over already
  * aggregated inputs (S7), like [[PngChart]].
  */
object PdfReport {

  // LETTER in PDF points
  private val PW = 612.0
  private val PH = 792.0

  final case class Stats(
      avgBefore: Option[Double],
      avgAfter: Option[Double],
      pValue: Option[Double])

  /** Build and write the 2-page report; returns the path. */
  def writeReport(
      series: Seq[(Int, Double)],
      country: String,
      antigen: String,
      campaignStart: Int,
      preYears: Int,
      postYears: Int,
      stats: Stats,
      outPath: String,
      today: java.time.LocalDate = java.time.LocalDate.now()): String = {
    val cover = coverContent(country, antigen, today)
    val body = bodyContent(series, country, antigen, campaignStart, preYears, postYears, stats)
    val bytes = assemble(Seq(cover, body))
    val target = Path.of(outPath)
    Option(target.getParent).foreach(Files.createDirectories(_))
    Files.write(target, bytes)
    outPath
  }

  // ---- content streams ----------------------------------------------

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** Locale-invariant number formatting: PDF operands must use '.'
    * decimal separators regardless of the JVM default locale (the f
    * interpolator is locale-sensitive — a comma-decimal locale would
    * corrupt every content stream). */
  private def fmtR(pattern: String, args: Any*): String =
    String.format(java.util.Locale.ROOT, pattern,
      args.map(_.asInstanceOf[Object]): _*)

  private def text(x: Double, y: Double, size: Double, s: String,
                   bold: Boolean = false, rgb: (Double, Double, Double) = (0, 0, 0)): String = {
    val font = if (bold) "/F2" else "/F1"
    // user text must NOT enter the format pattern (a literal '%' in the
    // string would be read as a specifier) — concatenate around it
    fmtR("BT %.3f %.3f %.3f rg ", rgb._1, rgb._2, rgb._3) + font +
      fmtR(" %.1f Tf %.1f %.1f Td ", size, x, y) +
      "(" + esc(s) + ") Tj ET\n"
  }

  private def coverContent(country: String, antigen: String, today: java.time.LocalDate): String = {
    val navy = (0.039, 0.122, 0.267) // #0A1F44
    val slate = (0.173, 0.243, 0.314) // #2C3E50
    val sb = new StringBuilder
    sb ++= text(54, PH - 160, 22, "Global Vaccination Coverage Explorer", bold = true, navy)
    sb ++= text(54, PH - 185, 11, "Policy report for country vaccination coverage monitoring", rgb = slate)
    sb ++= text(54, PH - 225, 11, s"Country: $country", rgb = slate)
    sb ++= text(54, PH - 240, 11, s"Antigen: $antigen", rgb = slate)
    sb ++= text(54, PH - 255, 11, s"Generated on: ${today.toString}", rgb = slate)
    sb.toString
  }

  private def bodyContent(
      series: Seq[(Int, Double)],
      country: String,
      antigen: String,
      campaignStart: Int,
      preYears: Int,
      postYears: Int,
      stats: Stats): String = {
    val navy = (0.039, 0.122, 0.267)
    val slate = (0.173, 0.243, 0.314)
    val sb = new StringBuilder
    var y = PH - 60

    sb ++= text(47, y, 14, "Executive summary", bold = true, navy); y -= 18
    sb ++= text(47, y, 10,
      s"Country $country and antigen $antigen were analyzed over a reference year of " +
        s"$campaignStart with windows of $preYears years before and $postYears years after.",
      rgb = slate); y -= 14
    val diff = for (b <- stats.avgBefore; a <- stats.avgAfter) yield a - b
    def fmt(o: Option[Double], p: String = "%.1f"): String = o.map(v => fmtR(p, v)).getOrElse("N/A")
    sb ++= text(47, y, 10,
      s"Before mean is ${fmt(stats.avgBefore)}%, after mean is ${fmt(stats.avgAfter)}%, " +
        s"difference is ${diff.map(d => fmtR("%+.1f", d)).getOrElse("N/A")} percentage points, " +
        s"and p-value is ${fmt(stats.pValue, "%.4f")}.",
      rgb = slate); y -= 26

    // trend chart as vector ops: frame, series polyline, dashed marker
    sb ++= text(47, y, 14, "Coverage trend chart", bold = true, navy); y -= 10
    val (cx, cw, ch) = (47.0, PW - 94, 150.0)
    val cy = y - ch
    sb ++= fmtR("0.9 0.9 0.9 RG 0.8 w %.1f %.1f %.1f %.1f re S\n", cx, cy, cw, ch)
    if (series.nonEmpty) {
      val years = series.map(_._1)
      val xLo = math.min(years.min, campaignStart - preYears)
      val xHi = math.max(years.max, campaignStart + postYears)
      def px(yr: Double) = cx + (yr - xLo) / math.max(1e-9, xHi - xLo) * cw
      def py(v: Double) = cy + v / 100.0 * ch
      val pts = series.map { case (yr, v) => (px(yr), py(v)) }
      sb ++= "0.039 0.122 0.267 RG 1.2 w\n"
      sb ++= fmtR("%.1f %.1f m ", pts.head._1, pts.head._2) +
        pts.tail.map { case (x, yy) => fmtR("%.1f %.1f l", x, yy) }.mkString(" ") + " S\n"
      // markers: tiny filled squares (circles need bezier; squares suffice)
      sb ++= "0.039 0.122 0.267 rg\n"
      pts.foreach { case (x, yy) => sb ++= fmtR("%.1f %.1f 3 3 re f\n", x - 1.5, yy - 1.5) }
      // dashed red campaign line
      sb ++= fmtR("0.784 0.220 0.165 RG [3 3] 0 d %.1f %.1f m %.1f %.1f l S [] 0 d\n",
        px(campaignStart), cy, px(campaignStart), cy + ch)
    }
    y = cy - 26

    // data table: header + top 20 rows, grid-ruled
    sb ++= text(47, y, 14, "Data table (top 20 rows)", bold = true, navy); y -= 16
    val rows = ("year", "coverage_pct") +: series.take(20).map { case (yr, v) => (yr.toString, fmtR("%.2f", v)) }
    val (colW, rowH) = (90.0, 13.0)
    rows.zipWithIndex.foreach { case ((c1, c2), i) =>
      val ry = y - i * rowH
      if (i == 0) { // header band, navy fill + white text
        sb ++= fmtR("0.039 0.122 0.267 rg 47 %.1f %.1f %.1f re f\n", ry - 3.5, 2 * colW, rowH)
        sb ++= text(52, ry, 8.5, c1, bold = true, (1, 1, 1))
        sb ++= text(52 + colW, ry, 8.5, c2, bold = true, (1, 1, 1))
      } else {
        sb ++= text(52, ry, 8.5, c1, rgb = slate)
        sb ++= text(52 + colW, ry, 8.5, c2, rgb = slate)
      }
      sb ++= fmtR("0.886 0.902 0.925 RG 0.25 w 47 %.1f %.1f %.1f re S\n", ry - 3.5, 2 * colW, rowH)
    }
    y -= rows.size * rowH + 18

    sb ++= text(47, math.max(y, 30), 8.5,
      "Generated by the graft Spark engine - distributed analysis, driver-side presentation.",
      rgb = (0.42, 0.447, 0.502))
    sb.toString
  }

  // ---- PDF assembly -------------------------------------------------

  /** Objects: 1 catalog, 2 pages-tree, 3/4 fonts, then per page
    * (page obj, content stream). Uncompressed streams, table xref. */
  private def assemble(pageContents: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def obj(body: String): Unit = { // records offset of "N 0 obj"
      offsets += out.size()
      w(s"${offsets.size} 0 obj\n$body\nendobj\n")
    }

    w("%PDF-1.4\n")
    val nPages = pageContents.size
    val pageIds = (0 until nPages).map(i => 5 + 2 * i)
    obj("<< /Type /Catalog /Pages 2 0 R >>")
    obj(s"<< /Type /Pages /Kids [${pageIds.map(id => s"$id 0 R").mkString(" ")}] /Count $nPages >>")
    obj("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    obj("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>")
    pageContents.foreach { content =>
      val contentId = offsets.size + 2
      obj(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $PW $PH] " +
        s"/Resources << /Font << /F1 3 0 R /F2 4 0 R >> >> /Contents $contentId 0 R >>")
      val bytes = content.getBytes(StandardCharsets.ISO_8859_1)
      obj(s"<< /Length ${bytes.length} >>\nstream\n$content\nendstream")
    }
    val xrefAt = out.size()
    w(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(fmtR("%010d 00000 n \n", o)))
    w(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n" + "%%EOF\n")
    out.toByteArray
  }
}
