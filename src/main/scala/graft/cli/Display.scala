package graft.cli

import org.apache.spark.sql.DataFrame

/** Reference-format result tables (src/run_queries.py:78-127 `_display_table`):
  *
  *   - column width = the longest rendered value in the first 100 rows
  *     (header included), clamped to [10, 50];
  *   - cells joined with " | ", header underlined with '-' to the full
  *     line width;
  *   - floats render as %.2f, SQL NULL as "NULL", everything else via its
  *     string form (decimals keep their full scale, as psycopg2's Decimal
  *     does in the reference);
  *   - values longer than the column clamp truncate to width-3 + "...";
  *   - display caps at 100 rows with a "... (showing first 100 of N rows)"
  *     trailer, and a "Rows returned: N" footer.
  *
  * Scale posture: the formatter pulls at most `cap + 1` rows to the driver
  * (`take`, not `collect`) — the exact count for the trailer/footer is a
  * separate aggregate job that runs ONLY when the result actually exceeds
  * the cap; an under-cap result (the common case for analytics output)
  * costs one take and zero extra jobs.
  */
object Display {

  val RowCap = 100
  val MinWidth = 10
  val MaxWidth = 50

  private def render(v: Any): String = v match {
    case null                 => "NULL"
    case d: Double            => f"$d%.2f"
    case f: Float             => f"$f%.2f"
    case other                => other.toString
  }

  /** Pure formatting core: (header names, rendered row cells) → table lines.
    * `cap` bounds both the width sample and the printed body — it must be
    * the SAME cap the caller fetched with, else a `--limit` above the
    * default prints fewer rows than the trailer claims (ADVICE r6).
    */
  def formatTable(headers: Seq[String], rows: Seq[Seq[String]],
                  cap: Int = RowCap): Seq[String] = {
    val widths = headers.zipWithIndex.map { case (h, i) =>
      val longest = (h.length +: rows.take(cap).map(_(i).length)).max
      math.min(math.max(longest, MinWidth), MaxWidth)
    }
    def cell(s: String, w: Int): String =
      (if (s.length > w) s.take(w - 3) + "..." else s).padTo(w, ' ')
    val headerLine = headers.zip(widths).map { case (h, w) => cell(h, w) }.mkString(" | ")
    val body = rows.take(cap).map(r =>
      r.zip(widths).map { case (s, w) => cell(s, w) }.mkString(" | "))
    (headerLine +: ("-" * headerLine.length) +: body)
  }

  /** Format and print a DataFrame the way the reference prints query
    * results. Returns the number of rows fetched (≤ cap + 1), for callers
    * that chain output.
    */
  def printTable(df: DataFrame, cap: Int = RowCap): Unit = {
    val fetched = df.take(cap + 1)
    if (fetched.isEmpty) { println("\nRows returned: 0"); return }
    val headers = df.columns.toSeq
    val rendered = fetched.take(cap).toSeq.map(r =>
      headers.indices.map(i => render(r.get(i))))
    println()
    formatTable(headers, rendered, cap).foreach(println)
    if (fetched.length > cap) {
      val total = df.count() // only when truncated — see scaladoc
      println(s"\n... (showing first $cap of $total rows)")
      println(s"\nRows returned: $total")
    } else {
      println(s"\nRows returned: ${fetched.length}")
    }
  }
}
