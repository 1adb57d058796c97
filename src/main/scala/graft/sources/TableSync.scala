package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Follower-table replication over the change feed (the APPLY CHANGES
  * pattern): keep a destination lakehouse table equal to a source table by
  * applying the source's net row changes — insert/update_postimage rows
  * upsert, delete rows remove — in ONE file-pruned [[LakehouseTable
  * .mergeApply]] commit per sync, stamped with the source version under
  * this syncer's writer app id so crashed or repeated syncs resume exactly
  * (same watermark discipline as [[IncrementalView]]).
  *
  * At 100 TB each sync costs O(source churn) to read (changed files only)
  * and O(destination files holding changed keys) to write — a follower
  * stays in lockstep for the price of the changes, never a snapshot copy.
  * The destination can also live in a DIFFERENT storage root/region, which
  * is the point: this is how a replica, a dev fork, or a downstream-owned
  * copy tracks a production table. */
object TableSync {
  private val App = "table-sync"

  sealed trait Mode
  object Mode {
    /** First sync: destination created from the source snapshot. */
    case object Created extends Mode
    /** Source unchanged since the last sync. */ case object NoOp extends Mode
    /** Net changes applied through the feed. */ case object Applied extends Mode
  }

  /** Seed the follower from the source AT `atVersion` (default current)
    * without applying anything further — split out so tests and builders
    * can start a follower BEHIND the source and let [[applyChanges]]
    * catch it up through the feed. */
  def seed(spark: SparkSession, srcRoot: String, dstRoot: String,
      atVersion: Option[Long] = None): Long = {
    val v = atVersion.orElse(LakehouseTable.currentVersion(srcRoot)).getOrElse(
      throw new IllegalStateException(s"no table at $srcRoot"))
    LakehouseTable.create(LakehouseTable.read(spark, srcRoot, Some(v)),
      dstRoot, txn = Some(v), txnApp = App)
    v
  }

  /** Advance `dstRoot` to the source's current version. Returns the source
    * version now reflected and how it got there. */
  def applyChanges(spark: SparkSession, srcRoot: String, dstRoot: String,
      rowKeys: Seq[String]): (Long, Mode) = {
    require(rowKeys.nonEmpty, "applyChanges requires row-identity keys")
    val srcV = LakehouseTable.currentVersion(srcRoot).getOrElse(
      throw new IllegalStateException(s"no table at $srcRoot"))
    LakehouseTable.lastTxn(dstRoot, App) match {
      case None => (seed(spark, srcRoot, dstRoot, Some(srcV)), Mode.Created)
      case Some(doneV) if doneV >= srcV => (srcV, Mode.NoOp)
      case Some(doneV) =>
        val feed = LakehouseTable.changeFeed(spark, srcRoot, doneV, srcV, rowKeys)
        val upserts = feed
          .filter(col("_change_type").isin("insert", "update_postimage"))
          .drop("_change_type")
        val deletes = feed.filter(col("_change_type") === "delete")
          .drop("_change_type")
        LakehouseTable.mergeApply(spark, dstRoot, upserts, deletes, rowKeys,
          txn = Some(srcV), txnApp = App)
        (srcV, Mode.Applied)
    }
  }
}
