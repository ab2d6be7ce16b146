package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date attribute derivations matching the reference's dim_date logic
  * (/root/reference/src/transform.py:344-403 and sql/populate_dim_date.sql).
  * All pure Column compositions — fully codegen'd, no UDFs.
  */
object DateFns {

  /** Smart date key: int YYYYMMDD (reference src/transform.py:380). */
  def dateKey(d: Column): Column = date_format(d, "yyyyMMdd").cast("int")

  /** ISO day of week, 1=Monday..7=Sunday (reference uses pandas
    * dt.isocalendar / PG EXTRACT(ISODOW)). Spark's dayofweek is 1=Sunday,
    * so shift: ((dow + 5) mod 7) + 1.
    */
  def isoDayOfWeek(d: Column): Column = ((dayofweek(d) + 5) % 7) + 1

  /** Saturday/Sunday flag (reference src/transform.py:398). */
  def isWeekend(d: Column): Column = isoDayOfWeek(d).isin(6, 7)

  def monthName(d: Column): Column = date_format(d, "MMMM")
  def dayName(d: Column): Column = date_format(d, "EEEE")
}
