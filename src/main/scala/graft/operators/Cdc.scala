package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC apply: merge a change feed (insert/update/delete ops with a
  * monotone sequence) into a snapshot — the batch MERGE INTO pattern that
  * pairs with [[LatestRecords]] (which the reference uses for the same
  * compaction step, dataframe.py:150) and [[Scd2]] (which keeps history
  * instead of overwriting).
  *
  * Two phases, ONE shuffle each at scale:
  *  1. compact — latest change per key via the [[LatestRecords]] window
  *     (Debezium-style feeds carry many ops per key; only the last wins).
  *     The window's hash partitioning on the PK is exactly the join
  *     distribution phase 2 needs, so Catalyst reuses the exchange.
  *  2. merge — full-outer join snapshot ↔ compacted changes on the PK:
  *     op = D drops the row, I/U take the change's row image, keys without
  *     a change keep the snapshot row. With AQE a small compacted feed
  *     demotes the join to broadcast and the snapshot side never shuffles —
  *     the common nightly-merge shape at 100 TB.
  */
object Cdc {

  /** `changes` must carry `pkCols`, `opCol` (values 'I'/'U'/'D'), `seqCol`,
    * and the same value columns as `snapshot` (full row images; ignored for
    * deletes). Returns the merged snapshot with `snapshot`'s schema.
    */
  def applyChanges(
      snapshot: DataFrame,
      changes: DataFrame,
      pkCols: Seq[String],
      opCol: String = "op",
      seqCol: String = "seq"
  ): DataFrame = {
    val valueCols = snapshot.columns.filterNot(pkCols.contains).toSeq
    val compacted = LatestRecords.latest(changes, pkCols, Seq(seqCol))
    // prefix the change side's non-PK columns so the full-outer join is
    // unambiguous (snapshot keeps the real names)
    val renamed = (valueCols :+ opCol :+ seqCol).foldLeft(compacted) {
      (d, n) => d.withColumnRenamed(n, s"__c_$n")
    }
    val changed = col(s"__c_$opCol").isNotNull
    snapshot
      .join(renamed, pkCols, "full_outer")
      .filter(!changed || col(s"__c_$opCol") =!= "D")
      .select(pkCols.map(col) ++ valueCols.map { n =>
        when(changed, col(s"__c_$n")).otherwise(col(n)).as(n)
      }: _*)
  }
}
