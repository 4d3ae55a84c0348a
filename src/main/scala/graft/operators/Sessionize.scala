package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: rows of the same key whose successive
  * timestamps are within `gapMicros` belong to one session.
  *
  * One window pass per key (shuffle on key + sort by time): a row opens a
  * new session when it has no predecessor or the gap exceeds the
  * threshold; the running sum of "session opens" numbers the sessions.
  */
object Sessionize {

  /** @return `df` plus a `session_id` column (1-based per key). */
  def assign(df: DataFrame, key: Column, time: Column): DataFrame =
    assign(df, key, time, gapMicros = 30L * 60 * 1000000)

  def assign(df: DataFrame, key: Column, time: Column, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(time)
    val prev = lag(unix_micros(time), 1).over(w)
    val opens = when(prev.isNull || unix_micros(time) - prev > gapMicros, 1).otherwise(0)
    df.withColumn("session_id",
      sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
  }
}
