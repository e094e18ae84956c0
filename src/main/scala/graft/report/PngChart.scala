package graft.report

import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.awt.image.BufferedImage
import java.nio.file.{Files, Path}

/** The reference's PNG line-plot artifact
  * (`/root/reference/etl_pipeline.py:156-172`) rendered with headless
  * AWT — no plotting library ships here, and none is needed for one
  * deterministic line chart. Same visual semantics: coverage series
  * with point markers, dashed red campaign-start line, shaded
  * before/after spans, fixed 0–100 y-range, light grid, title + axis
  * labels.
  *
  * Driver-side presentation (SURVEY §2.1 S7): the input is the ALREADY
  * AGGREGATED per-series frame (one country × antigen × ≤ decades of
  * years), never a distributed dataset — the engine does the heavy
  * lifting, this draws ≤ a few hundred points.
  */
object PngChart {

  private val W = 1000
  private val H = 500
  private val ML = 70   // margins: left, right, top, bottom
  private val MR = 25
  private val MT = 45
  private val MB = 55

  /** Render `series` (year, coverage_pct ordered by year) and write a
    * PNG; returns the path. */
  def writeCoveragePlot(
      series: Seq[(Int, Double)],
      country: String,
      antigen: String,
      startYear: Int,
      preYears: Int,
      postYears: Int,
      outPath: String): String = {
    require(series.nonEmpty,
      "empty series — nothing to plot (EtlCli guards this; other callers must too)")
    System.setProperty("java.awt.headless", "true")
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, W, H)

      val years = series.map(_._1)
      val xLo = math.min(years.min, startYear - preYears)
      val xHi = math.max(years.max, startYear + postYears)
      def px(year: Double): Int = ML + ((year - xLo) / math.max(1e-9, xHi - xLo) * (W - ML - MR)).toInt
      def py(v: Double): Int = H - MB - (v / 100.0 * (H - MT - MB)).toInt

      // before (lightblue) / after (lightgreen) spans, alpha ~0.3
      g.setColor(new Color(173, 216, 230, 80))
      g.fillRect(px(startYear - preYears), MT, px(startYear) - px(startYear - preYears), H - MT - MB)
      g.setColor(new Color(144, 238, 144, 80))
      g.fillRect(px(startYear), MT, px(startYear + postYears) - px(startYear), H - MT - MB)

      // grid + y labels every 20%
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 12))
      (0 to 100 by 20).foreach { v =>
        g.setColor(new Color(0, 0, 0, 30))
        g.drawLine(ML, py(v), W - MR, py(v))
        g.setColor(Color.DARK_GRAY)
        g.drawString(v.toString, ML - 30, py(v) + 5)
      }
      // x labels: ~8 ticks
      val step = math.max(1, (xHi - xLo) / 8)
      (xLo to xHi by step).foreach { y =>
        g.setColor(Color.DARK_GRAY)
        g.drawString(y.toString, px(y) - 14, H - MB + 20)
      }

      // axes
      g.setColor(Color.BLACK)
      g.drawLine(ML, MT, ML, H - MB)
      g.drawLine(ML, H - MB, W - MR, H - MB)

      // campaign-start dashed red vline
      g.setColor(new Color(200, 40, 40))
      g.setStroke(new BasicStroke(1.5f, BasicStroke.CAP_BUTT, BasicStroke.JOIN_MITER,
        10f, Array(6f, 6f), 0f))
      g.drawLine(px(startYear), MT, px(startYear), H - MB)

      // the series: line + circular markers
      g.setStroke(new BasicStroke(2f))
      g.setColor(new Color(31, 119, 180))
      series.sliding(2).foreach {
        case Seq((y1, v1), (y2, v2)) => g.drawLine(px(y1), py(v1), px(y2), py(v2))
        case _ =>
      }
      series.foreach { case (y, v) => g.fillOval(px(y) - 4, py(v) - 4, 8, 8) }

      // title + axis labels
      g.setColor(Color.BLACK)
      g.setFont(new Font(Font.SANS_SERIF, Font.BOLD, 16))
      g.drawString(s"$country — $antigen coverage over time", ML + 90, 22)
      g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 13))
      g.drawString("Year", (W - ML - MR) / 2 + ML - 15, H - 12)
      g.drawString("Coverage (%)", 8, MT - 5)
    } finally g.dispose()

    val target = Path.of(outPath)
    Option(target.getParent).foreach(Files.createDirectories(_))
    javax.imageio.ImageIO.write(img, "png", target.toFile)
    outPath
  }
}
