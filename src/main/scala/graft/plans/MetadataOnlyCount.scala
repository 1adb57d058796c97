package graft.plans

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** METADATA-ONLY `count(*)` over graft lakehouse tables (the
  * OptimizeMetadataOnlyDeltaQuery idea): an unfiltered, ungrouped
  * `count(1)` whose child is a BARE parquet relation rooted in a graft
  * table's `data/` dir is answered from the parquet FOOTER row counts of
  * exactly the relation's files — O(files) footer reads, zero data pages,
  * zero tasks. At 100 TB this turns the most common dashboard query from
  * a full scan into manifest-sized arithmetic.
  *
  * Safety envelope — the rewrite fires ONLY when the child is the bare
  * relation (at most an attribute-only / empty Project in between, which
  * is what ColumnPruning leaves under a count):
  *  - a Filter above the scan → no match (the count is selective);
  *  - a DELETION-VECTOR read is an anti-join plan, never a bare
  *    relation → no match, the join runs (correct, just not
  *    metadata-only);
  *  - column-mapped (renamed) reads wrap the scan in a renaming
  *    Project of Aliases → no match needed for correctness, but row
  *    count is projection-invariant, so attribute-only projects are
  *    accepted and alias projects simply decline;
  *  - time-travel / file-pruned reads list their OWN file set — the
  *    footers counted are exactly the files Spark would have scanned.
  * Footer row counts are exact for parquet (no estimate anywhere). Any
  * IO error falls back to the original plan — the rule can decline,
  * never corrupt. */
case class MetadataOnlyGraftCount(spark: SparkSession) extends Rule[LogicalPlan] {

  private def bareGraftFiles(plan: LogicalPlan): Option[Seq[String]] = plan match {
    case Project(projectList, child)
        if projectList.forall(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]) =>
      bareGraftFiles(child)
    case l: LogicalRelation =>
      l.relation match {
        case fs: HadoopFsRelation =>
          val files = fs.location.inputFiles.toSeq
          val isGraft = files.nonEmpty && files.forall { f =>
            val i = f.indexOf("/data/")
            i > 0 && {
              val root = f.substring(0, i).stripPrefix("file:")
              Files.isDirectory(Paths.get(root, "_manifest"))
            }
          }
          if (isGraft) Some(files) else None
        case _ => None
      }
    case _ => None
  }

  import scala.jdk.CollectionConverters._

  private def footerCount(files: Seq[String]): Option[Long] =
    try {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val conf = new org.apache.hadoop.conf.Configuration()
      var total = 0L
      files.foreach { f =>
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f), conf))
        try total += reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally reader.close()
      }
      Some(total)
    } catch { case _: Throwable => None } // decline, never corrupt

  private def isPlainCountStar(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Count(children) => children.forall {
        case Literal(v, _) => v != null
        case _ => false
      }
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall {
          case Alias(ae: AggregateExpression, _) => isPlainCountStar(ae)
          case _ => false
        } =>
      (for {
        files <- bareGraftFiles(child)
        n <- footerCount(files)
      } yield LocalRelation(
        agg.output.map(_.asInstanceOf[org.apache.spark.sql.catalyst.expressions.AttributeReference]),
        Seq(InternalRow.fromSeq(agg.output.map(_ => n))))
      ).getOrElse(agg)
  }
}
