package graft.tools

/** Terminal line-chart renderer for vector query results — the CLI
  * analogue of the reference's chart display surface
  * (tachyon_cli/src/main.rs:236-240, a 180x60 textplots canvas). The
  * rendering here is an original ASCII implementation: one mark per
  * column, linearly interpolated between bracketing samples so the
  * series reads as a connected line; samples themselves print as '*',
  * interpolated fill as '.'. Pure string in/out so the E2E spec can
  * assert on it, plain ASCII so any terminal works.
  */
object Chart {

  def render(points: Seq[(Long, Double)],
      width: Int = 120, height: Int = 24): String = {
    val pts = points.filterNot { case (_, v) => v.isNaN || v.isInfinite }
      .sortBy(_._1)
    if (pts.isEmpty) return "(no data)"
    val (t0, t1) = (pts.head._1, pts.last._1)
    val vs = pts.map(_._2)
    val (vmin, vmax) = (vs.min, vs.max)
    val vspan = if (vmax > vmin) vmax - vmin else 1.0
    val tspan = math.max(1L, t1 - t0)
    val w = math.max(2, width)
    val h = math.max(2, height)
    val grid = Array.fill(h, w)(' ')

    def rowOf(v: Double): Int =
      h - 1 - math.round((v - vmin) / vspan * (h - 1)).toInt
    def colOf(ts: Long): Int =
      math.round((ts - t0).toDouble / tspan * (w - 1)).toInt

    // connect adjacent samples: fill the strictly-between columns with
    // the linearly interpolated value (skipped when both samples land in
    // the same or neighboring columns)
    pts.sliding(2).foreach {
      case Seq((ta, va), (tb, vb)) if tb > ta =>
        val (ca, cb) = (colOf(ta), colOf(tb))
        for (c <- ca + 1 until cb) {
          val ts = t0 + math.round(c.toDouble / (w - 1) * tspan)
          val f = (ts - ta).toDouble / (tb - ta)
          val r = rowOf(va + f * (vb - va))
          if (grid(r)(c) == ' ') grid(r)(c) = '.'
        }
      case _ =>
    }
    // samples overwrite interpolation marks
    pts.foreach { case (ts, v) => grid(rowOf(v))(colOf(ts)) = '*' }

    def label(v: Double): String = {
      val s = if (v == v.longValue.toDouble) v.longValue.toString
        else f"$v%.3f"
      s.reverse.padTo(10, ' ').reverse
    }
    val rows = grid.zipWithIndex.map { case (line, r) =>
      val lbl =
        if (r == 0) label(vmax)
        else if (r == h - 1) label(vmin)
        else " " * 10
      lbl + " |" + line.mkString
    }
    (rows :+ (" " * 10 + " +" + "-" * w) :+
      (" " * 12 + s"$t0 .. $t1  n=${pts.size}")).mkString("\n")
  }
}
