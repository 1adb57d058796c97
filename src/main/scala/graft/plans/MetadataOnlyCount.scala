package graft.plans

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** METADATA-ONLY `count(*)` / `min` / `max` over graft lakehouse tables
  * (the OptimizeMetadataOnlyDeltaQuery idea): an unfiltered, ungrouped
  * aggregate whose child is a BARE parquet relation rooted in a graft
  * table's `data/` dir is answered from the parquet FOOTERS of exactly
  * the relation's files — O(files) footer reads, zero data pages, zero
  * tasks. At 100 TB this turns the most common dashboard queries from
  * full scans into manifest-sized arithmetic.
  *
  * min/max is deliberately NARROW: only INT32/INT64 physical chunks with
  * no decimal/timestamp logical annotation and non-null stats in EVERY
  * chunk of every file (an all-null chunk declines the whole rewrite).
  * Footer min/max ignores nulls, which is exactly SQL min/max; float
  * columns are excluded because parquet NaN statistics are untrustworthy
  * by spec.
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

  /** min/max of an INT32/INT64 column straight from the footers: Some
    * value only when EVERY chunk of every file carries usable non-null
    * stats with no logical-type reinterpretation. */
  private def footerMinMax(files: Seq[String], column: String,
      wantMax: Boolean): Option[Long] =
    try {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
      val conf = new org.apache.hadoop.conf.Configuration()
      var acc: Option[Long] = None
      var ok = true
      files.foreach { f =>
        if (ok) {
          val reader = ParquetFileReader.open(
            HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f), conf))
          try {
            val chunks = reader.getFooter.getBlocks.asScala
              .flatMap(_.getColumns.asScala
                .filter(_.getPath.toDotString == column))
            if (chunks.isEmpty) ok = false
            chunks.foreach { c =>
              val pt = c.getPrimitiveType
              val typeOk = (pt.getPrimitiveTypeName == PrimitiveTypeName.INT64 ||
                pt.getPrimitiveTypeName == PrimitiveTypeName.INT32) &&
                (pt.getLogicalTypeAnnotation == null ||
                  pt.getLogicalTypeAnnotation.isInstanceOf[
                    org.apache.parquet.schema.LogicalTypeAnnotation.IntLogicalTypeAnnotation])
              val s = c.getStatistics
              if (!typeOk || s == null || !s.hasNonNullValue) ok = false
              else {
                val v = (if (wantMax) s.genericGetMax else s.genericGetMin) match {
                  case l: java.lang.Long => l.longValue()
                  case i: java.lang.Integer => i.longValue()
                  case _ => { ok = false; 0L }
                }
                if (ok) acc = Some(acc.fold(v)(a =>
                  if (wantMax) math.max(a, v) else math.min(a, v)))
              }
            }
          } finally reader.close()
        }
      }
      if (ok) acc else None
    } catch { case _: Throwable => None }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall {
          case Alias(ae: AggregateExpression, _) =>
            isPlainCountStar(ae) || isPlainMinMax(ae)
          case _ => false
        } =>
      (for {
        files <- bareGraftFiles(child)
        values <- evalAll(aggExprs, files)
      } yield LocalRelation(
        agg.output.map(_.asInstanceOf[org.apache.spark.sql.catalyst.expressions.AttributeReference]),
        Seq(InternalRow.fromSeq(values)))
      ).getOrElse(agg)
  }

  import org.apache.spark.sql.catalyst.expressions.{Attribute, NamedExpression}
  import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}
  import org.apache.spark.sql.types.{IntegerType, LongType}

  private def isPlainMinMax(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Min(a: Attribute) => a.dataType == LongType || a.dataType == IntegerType
      case Max(a: Attribute) => a.dataType == LongType || a.dataType == IntegerType
      case _ => false
    })

  /** One footer value per aggregate expression, all-or-nothing: a single
    * undeterminable column declines the whole rewrite. */
  private def evalAll(aggExprs: Seq[NamedExpression],
      files: Seq[String]): Option[Seq[Any]] = {
    lazy val count = footerCount(files)
    val vs = aggExprs.map {
      case Alias(ae: AggregateExpression, _) => ae.aggregateFunction match {
        case Count(_) => count
        case Min(a: Attribute) => footerMinMax(files, a.name, wantMax = false)
          .map(v => if (a.dataType == IntegerType) v.toInt else v)
        case Max(a: Attribute) => footerMinMax(files, a.name, wantMax = true)
          .map(v => if (a.dataType == IntegerType) v.toInt else v)
        case _ => None
      }
      case _ => None
    }
    if (vs.forall(_.isDefined)) Some(vs.map(_.get)) else None
  }
}
