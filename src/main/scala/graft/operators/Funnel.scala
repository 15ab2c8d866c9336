package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-stage conversion funnel over an event stream: for each
  * subject, the earliest time of stage 1, then the earliest stage-2
  * event AT OR AFTER that, and so on — the classic product-analytics
  * "view → click → purchase" sequential-conversion operator (each stage
  * must happen after the previous one, not merely sometime).
  *
  * Shape: one keyed aggregation per stage, every join and agg keyed by
  * the subject id — so at scale all passes are co-partitioned shuffles
  * on one key (stage count is small and fixed). The base population is
  * subjects that reached stage 1; later stages are left-joined so the
  * funnel row is kept with NULL stage times where the subject dropped
  * off. Deterministic: min() over exact integer timestamps.
  */
object Funnel {

  /** One row per subject that reached `stages.head`: (id, t0 … t{k−1})
    * with t_i = earliest `stages(i)` timestamp ≥ t_{i−1}, NULL from the
    * first stage the subject never reached. */
  def conversion(events: DataFrame, stages: Seq[String],
                 idCol: String = "user_id", tsCol: String = "ts_us",
                 typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage required")
    val ev = events.select(col(idCol), col(typeCol), col(tsCol))
    var acc = ev.filter(col(typeCol) === stages.head)
      .groupBy(idCol)
      .agg(min(col(tsCol)).as("t0"))
    for (i <- 1 until stages.length) {
      val prev = s"t${i - 1}"
      val carried = (0 until i).map(j => s"t$j")
      acc = acc.join(
          ev.filter(col(typeCol) === stages(i))
            .select(col(idCol), col(tsCol).as("__ts")),
          Seq(idCol), "left")
        .groupBy(col(idCol) +: carried.map(col): _*)
        .agg(min(when(col(prev).isNotNull && col("__ts") >= col(prev),
          col("__ts"))).as(s"t$i"))
    }
    acc
  }
}
