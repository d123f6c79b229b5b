package graft.plans

import scala.util.Try

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
  LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.types._

import graft.operators.FileStats

/** Metadata-only aggregate answering — the 5th extension surface
  * (after the function set, the AsOfJoin strategy, BandLevenshtein,
  * and StatsPruneRule): a whole-table `count(*)` / `min(col)` /
  * `max(col)` over a parquet directory that carries a `_stats.json`
  * manifest is answered FROM THE MANIFEST, as a [[LocalRelation]] —
  * the physical plan contains no file scan at all. This is the
  * analog of Delta/Iceberg answering `SELECT count(*)` from add-file
  * stats: at 100 TB the difference between one driver-side sidecar
  * read and a full-table scan whose only output is one number.
  *
  * The rewrite fires ONLY when it is a proof, never a guess:
  *  - the aggregate is ungrouped, or grouped ONLY by bare partition
  *    columns (the directory-encoded values are the group keys — the
  *    per-partition census Spark's own OptimizeMetadataOnlyQuery
  *    reserves for catalog tables, here for path stores and with
  *    per-group min/max too); every aggregate output is count(*) /
  *    count(lit) / count(col) (non-null counts from the manifest) /
  *    min / max over a bare column (no DISTINCT, no FILTER clause,
  *    no expressions);
  *  - the child is the relation itself (optionally through a
  *    column-pruning Project of plain attributes), or a Filter whose
  *    every reference is a PARTITION column — such a predicate is
  *    EVALUATED against each file's directory-encoded values (all of
  *    a file's rows share them, so files wholly pass or wholly
  *    fail), which makes `count(*) WHERE p IN (...)` and friends
  *    metadata-answerable; a filter touching any data column breaks
  *    the pattern, so a data-filtered count never uses whole-file
  *    row counts;
  *  - the manifest's file set is EXACTLY the listing's file set
  *    (a file added outside the commit protocol disables the
  *    rewrite rather than undercounting);
  *  - min/max columns are integral, decimal, or date typed with
  *    stats tracked in every manifest entry. STRING stats are
  *    refused: the manifest truncates long string bounds
  *    (Iceberg truncate(L)), so a stored max is an upper BOUND, not
  *    necessarily an attained value — sound for pruning, unsound as
  *    an answer. Float/double are refused for the same
  *    attained-value caution (their stats round-trip through a
  *    string rendering this rule does not re-verify).
  *
  * min/max ignore nulls, and so do the manifest stats (a file whose
  * column is all-null stores no bounds and simply contributes
  * nothing); a table all-null in the column answers NULL, matching
  * the aggregate. Count answers the manifest's row sum — exact, the
  * same scan that wrote the files counted them.
  */
object StatsAggRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate => rewrite(agg).getOrElse(agg)
  }

  /** The relation under the aggregate, looking through column-pruning
    * Projects of bare attributes and collecting Filter conditions
    * (anything else — computed projections, joins — disqualifies the
    * rewrite; the collected condition must later prove to be a
    * partition-only predicate or the whole rewrite refuses). */
  private def unwrap(p: LogicalPlan)
      : Option[(LogicalRelation, Option[Expression])] = p match {
    case lr: LogicalRelation
        if lr.relation.isInstanceOf[HadoopFsRelation] =>
      Some((lr, None))
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(child)
    case org.apache.spark.sql.catalyst.plans.logical
        .Filter(cond, child) =>
      unwrap(child).map { case (lr, prev) =>
        (lr, Some(prev.map(And(_, cond)).getOrElse(cond)))
      }
    case _ => None
  }

  /** A filter whose every reference is a partition column is
    * EVALUATED — the real Catalyst predicate, no approximation —
    * against each file's directory-encoded partition values: all
    * rows of a file share them, so the file either wholly passes or
    * wholly fails, and every downstream count/min/max over the
    * surviving entries stays exact. Refuses on data-column
    * references, non-deterministic expressions, escaped partition
    * values, or unconvertible types. */
  private def filterEntries(h: HadoopFsRelation, cond: Expression,
      manifest: Seq[FileStats.FileStat])
      : Option[Seq[FileStats.FileStat]] = {
    if (!cond.deterministic) return None
    val pschema = h.location.partitionSchema
    val attrs = cond.references.toSeq
    if (attrs.isEmpty ||
        !attrs.forall(a => pschema.fieldNames.contains(a.name)))
      return None
    Try {
      val pred = Predicate.create(cond, attrs)
      pred.initialize(0)
      manifest.filter { e =>
        val segs = parseSegs(e.relPath)
        val values = attrs.map { a =>
          segs.get(a.name) match {
            case Some(None) => null
            case Some(Some(raw)) =>
              partitionValue(raw, a.dataType).getOrElse(
                throw new IllegalArgumentException(
                  s"unconvertible partition value: $raw"))
            case None => throw new IllegalArgumentException(
              s"unpartitioned file: ${e.relPath}")
          }
        }
        pred.eval(InternalRow.fromSeq(values))
      }
    }.toOption
  }

  /** A manifest path's `key=value` partition segments as raw
    * directory strings (None = the Hive null sentinel). The ONE
    * parser both the filter evaluator and the group-key extractor
    * use — the two must never disagree about the same directory
    * string. Throws (→ the caller's Try refuses the rewrite) on
    * non-partition segments and on escaped values, where the
    * directory string is not the value. */
  private def parseSegs(relPath: String)
      : Map[String, Option[String]] =
    relPath.split("/").dropRight(1).toSeq.map { s =>
      val i = s.indexOf('=')
      require(i > 0, s"not a partition segment: $s")
      val v = s.substring(i + 1)
      require(!v.contains("%"), s"escaped partition value: $v")
      s.substring(0, i) ->
        (if (v == "__HIVE_DEFAULT_PARTITION__") None else Some(v))
    }.toMap

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    for {
      rel <- unwrap(agg.child)
      (lr, condOpt) = rel
      h = lr.relation.asInstanceOf[HadoopFsRelation]
      if h.location.rootPaths.size == 1
      root = h.location.rootPaths.head
      qualified = Try(root.getFileSystem(
        h.sparkSession.sparkContext.hadoopConfiguration)
        .makeQualified(root)).getOrElse(root)
      manifest <- StatsPruneRule.manifestFor(h.sparkSession, qualified)
        .map(_._1)
      if manifest.nonEmpty && covers(h, qualified, manifest)
      entries <- condOpt match {
        case None => Some(manifest)
        case Some(cond) => filterEntries(h, cond, manifest)
      }
      rows <-
        if (agg.groupingExpressions.isEmpty)
          answers(agg.aggregateExpressions, entries).map(Seq(_))
        else groupedAnswers(agg, h, entries)
    } yield LocalRelation(agg.output, rows.map(InternalRow.fromSeq))
  }

  /** GROUP BY over PARTITION COLUMNS only — the directory-encoded
    * values are the group keys (one manifest pass groups the files),
    * and every aggregate answers per group exactly like the global
    * case. This is the metadata-only-query shape Spark reserves for
    * catalog tables (OptimizeMetadataOnlyQuery), generalized to
    * path-based stores AND to per-group min/max from the stats
    * sidecar. Refused wholesale when any grouping expression is not a
    * bare partition attribute, any partition value needs unescaping
    * (`%xx` — the directory string is not the value), or the
    * partition type is outside the provable set (int/long/string/
    * date); the Hive null sentinel groups as NULL, matching the scan.
    */
  private def groupedAnswers(agg: Aggregate, h: HadoopFsRelation,
      manifest: Seq[FileStats.FileStat]): Option[Seq[Seq[Any]]] = {
    val pschema = h.location.partitionSchema
    val groupCols: Option[Seq[AttributeReference]] =
      Try(agg.groupingExpressions.map {
        case a: AttributeReference
            if pschema.fieldNames.contains(a.name) => a
      }).toOption
    groupCols.flatMap { gcols =>
      // raw directory value per (file, partition col); None = the
      // Hive null sentinel; an escaped value refuses the rewrite
      val parsed: Option[Seq[(Map[String, Option[String]],
          FileStats.FileStat)]] =
        Try(manifest.map { e =>
          val segs = parseSegs(e.relPath)
          require(gcols.forall(g => segs.contains(g.name)),
            s"ungrouped file: ${e.relPath}")
          (segs, e)
        }).toOption
      parsed.flatMap { entries =>
        // group on the CONVERTED typed value, not the raw directory
        // string: filterEntries/partitionValue compare typed values,
        // and a non-canonical encoding in an externally-assembled
        // tree (p=03 vs p=3) parses to the same value — raw-string
        // grouping would emit duplicate group rows where the real
        // scan returns one. An unconvertible value refuses the
        // rewrite (the Try), keeping both code paths on one domain.
        val typedEntries: Option[Seq[(Map[String, Option[Any]],
            FileStats.FileStat)]] =
          Try(entries.map { case (segs, e) =>
            val tv = gcols.map { g =>
              g.name -> (segs(g.name) match {
                case None => None
                case Some(raw) =>
                  Some(partitionValue(raw, g.dataType).getOrElse(
                    throw new IllegalArgumentException(
                      s"unconvertible partition value: $raw")))
              })
            }.toMap
            (tv, e)
          }).toOption
        typedEntries.flatMap { tentries =>
          val groups = tentries.groupBy { case (tv, _) =>
            gcols.map(g => tv(g.name))
          }
          val rows = groups.toSeq.map { case (key, members) =>
            val byName = gcols.map(_.name).zip(key).toMap
            val sub = members.map(_._2)
            val vs = agg.aggregateExpressions.map {
              case a: AttributeReference if byName.contains(a.name) =>
                Some(byName(a.name).orNull: Any)
              case e => answers(Seq(e).collect {
                  case n: NamedExpression => n
                }, sub).map(_.head)
            }
            if (vs.exists(_.isEmpty)) None else Some(vs.map(_.get))
          }
          if (rows.exists(_.isEmpty)) None else Some(rows.map(_.get))
        }
      }
    }
  }

  /** A directory-encoded partition value as a Catalyst-internal value
    * of the inferred partition type — None refuses the rewrite. */
  private def partitionValue(raw: String, dt: DataType): Option[Any] =
    dt match {
      case IntegerType => Try(raw.toInt: Any).toOption
      case LongType => Try(raw.toLong: Any).toOption
      case StringType =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromString(raw))
      case DateType =>
        Try(java.time.LocalDate.parse(raw).toEpochDay.toInt: Any)
          .toOption
      case _ => None
    }

  /** The manifest file set must equal the listing's file set — a
    * data file the manifest doesn't know (or a manifest entry whose
    * file is gone) makes row counts and bounds unprovable. */
  private def covers(h: HadoopFsRelation, root: Path,
      manifest: Seq[FileStats.FileStat]): Boolean = {
    val rootStr = root.toUri.getPath
    val listed = h.location.inputFiles.map(f =>
      new Path(f).toUri.getPath.stripPrefix(rootStr)
        .stripPrefix("/")).toSet
    listed.nonEmpty && listed == manifest.map(_.relPath).toSet
  }

  /** One Catalyst-internal value per aggregate output, or None when
    * any output is not manifest-answerable (all-or-nothing: a partial
    * rewrite would have to keep the scan anyway). */
  private def answers(exprs: Seq[NamedExpression],
      manifest: Seq[FileStats.FileStat]): Option[Seq[Any]] = {
    val vs = exprs.map {
      case Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) if v != null =>
            Some(manifest.map(_.rows).sum: Any)
          // count(col) = the manifest's non-null counts — answerable
          // only when every entry tracks them (pre-nn manifests and
          // untracked columns refuse). Bare attributes AND nested
          // struct paths (the manifest keys them by dotted path; a
          // NULL parent struct counted as null on both sides)
          case Count(Seq(StatsFilters.PathRef(n, _)))
              if manifest.forall(_.nonNull.contains(n)) =>
            Some(manifest.map(_.nonNull(n)).sum: Any)
          case Min(StatsFilters.PathRef(n, dt)) =>
            bound(n, dt, manifest, isMin = true)
          case Max(StatsFilters.PathRef(n, dt)) =>
            bound(n, dt, manifest, isMin = false)
          case _ => None
        }
      case _ => None
    }
    if (vs.exists(_.isEmpty)) None else Some(vs.map(_.get))
  }

  // CE years only: a leading '-' (BCE) breaks the lexicographic =
  // chronological equivalence ('-0001' sorts above '-0002' but year
  // -2 is earlier), so negative-year stats refuse the rewrite
  private val IsoDate = """\d{4}-\d{2}-\d{2}""".r

  /** min/max of path `n` (leaf type `dt`) from the manifest, as a
    * Catalyst-internal value. None (refuse the rewrite) when the
    * column is untracked in any entry or the type/rendering is not
    * provably exact; Some(null) when every file is all-null in the
    * column — the aggregate's own answer. */
  private def bound(n: String, dt: DataType,
      manifest: Seq[FileStats.FileStat], isMin: Boolean): Option[Any] = {
    if (manifest.exists(m => !m.cols.contains(n))) return None
    val stats = manifest.flatMap(_.cols(n))
      .map(b => if (isMin) b._1 else b._2)
    if (stats.isEmpty) return Some(null)
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Try {
          val vs = stats.map(BigDecimal(_))
          val v = if (isMin) vs.min else vs.max
          dt match {
            case ByteType => v.toByteExact: Any
            case ShortType => v.toShortExact: Any
            case IntegerType => v.toIntExact: Any
            case _ => v.toLongExact: Any
          }
        }.toOption
      case d: DecimalType =>
        Try {
          val vs = stats.map(BigDecimal(_))
          val v = if (isMin) vs.min else vs.max
          Decimal(v, d.precision, d.scale): Any
        }.toOption
      case DateType =>
        // date stats are the cast-to-string ISO rendering; for the
        // uniform yyyy-MM-dd shape, lexicographic order IS date order
        if (stats.forall(s => IsoDate.matches(s)) &&
            stats.forall(_.length == stats.head.length))
          Try {
            val s = if (isMin) stats.min else stats.max
            java.time.LocalDate.parse(s).toEpochDay.toInt: Any
          }.toOption
        else None
      case _ => None // strings (truncated bounds), float/double
    }
  }
}
