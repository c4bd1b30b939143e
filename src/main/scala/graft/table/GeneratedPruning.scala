package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Filter derivation through generated-column definitions (Delta's
  * `OptimizeGeneratedColumn` idea, re-expressed over the source-Filter
  * algebra so ONE derivation feeds every pruning layer).
  *
  * A table partitioned (or sorted) by `d GENERATED ALWAYS AS
  * (to_date(ts))` is almost always queried by `ts` — and a predicate on
  * `ts` says nothing to partition pruning or stats skipping about `d`
  * unless someone derives the implied predicate. The rules:
  *
  *  - EQUALITY transfers through ANY deterministic definition:
  *    `g = f(c)` and `c = v` imply `g = f(v)` — determinism is the only
  *    requirement, so `substring`, `pmod`, hash buckets all derive.
  *  - RANGES transfer only through definitions this object can prove
  *    NON-DECREASING over the base column's domain (`to_date`,
  *    `date_trunc`, `trunc`, `year`, date/timestamp casts — over
  *    date/timestamp bases): `c > v` implies `g >= f(v)`, with the
  *    bound always RELAXED to `>=`/`<=` because f collapses distinct
  *    inputs to one output (to_date maps a whole day to one date).
  *
  * Derived filters are IMPLIED by the originals, so adding them to a
  * scan changes no result — they exist to hand partition pruning and
  * stats/bloom skipping predicates they can act on. f(v) is evaluated
  * driver-side through a session expression engine (literal
  * substitution + a one-row local select). Time-zone-sensitive
  * definitions evaluate under the zone RECORDED when the rule was
  * declared (the zone the stored values were computed under, enforced
  * on every write) — never the reader's zone, which may differ and
  * would make the implication unsound.
  */
object GeneratedPruning {

  /** Function names whose presence anywhere in a definition disqualifies
    * it: value depends on more than the base column's value. */
  private val NonDeterministic = Set(
    "rand", "randn", "random", "uuid", "shuffle", "now",
    "current_timestamp", "current_date", "localtimestamp", "current_timezone",
    "current_user", "session_user", "user", "monotonically_increasing_id",
    "spark_partition_id", "input_file_name", "unix_timestamp")

  private def fnName(f: UnresolvedFunction): String =
    f.nameParts.last.toLowerCase(java.util.Locale.ROOT)

  private def deterministic(e: Expression): Boolean =
    !e.exists {
      case f: UnresolvedFunction =>
        val n = fnName(f)
        NonDeterministic(n) && !(n == "unix_timestamp" && f.arguments.nonEmpty)
      case _ => false
    }

  /** The single base column a raw definition references, if exactly one. */
  def baseRef(spark: SparkSession, sqlExpr: String): Option[String] =
    scala.util.Try(spark.sessionState.sqlParser.parseExpression(sqlExpr))
      .toOption.flatMap(soleRef)

  /** Single base attribute referenced by the definition, if exactly one. */
  private def soleRef(e: Expression): Option[String] = {
    val refs = e.collect { case a: UnresolvedAttribute => a.nameParts.mkString(".") }
    refs.distinct match {
      case Seq(one) => Some(one)
      case _ => None
    }
  }

  /** Structural proof that the definition is non-decreasing in its base
    * column: a chain of order-preserving unary time wrappers. Only
    * meaningful when the base column itself is date/timestamp-typed
    * (string→date parses are NOT monotone in string order). */
  private def monotoneShape(e: Expression): Boolean = e match {
    case _: UnresolvedAttribute => true
    case c: Cast => (c.dataType match {
      case DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }) && monotoneShape(c.child)
    case f: UnresolvedFunction => fnName(f) match {
      case "to_date" if f.arguments.size == 1 => monotoneShape(f.arguments.head)
      case "date_trunc" if f.arguments.size == 2 &&
        f.arguments.head.isInstanceOf[Literal] => monotoneShape(f.arguments(1))
      case "trunc" if f.arguments.size == 2 &&
        f.arguments(1).isInstanceOf[Literal] => monotoneShape(f.arguments.head)
      case "year" if f.arguments.size == 1 => monotoneShape(f.arguments.head)
      case _ => false
    }
    case _ => false
  }

  private def dateLike(t: DataType): Boolean = t match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Function names whose result depends on the session time zone over
    * SOME input type (string→time parses, instant formatting, zone
    * shifts). Membership is checked against the raw definition, so a
    * zone-dependent call anywhere makes the whole definition sensitive. */
  private val TzDependentFns = Set(
    "to_timestamp", "unix_timestamp", "to_unix_timestamp", "from_unixtime",
    "date_format", "hour", "minute", "second", "convert_timezone",
    "to_utc_timestamp", "from_utc_timestamp", "unix_date", "unix_micros",
    "unix_millis", "unix_seconds", "weekday", "dayofweek", "to_char")

  /** Whether the definition's VALUE can depend on the session time
    * zone. A TimestampType base is an instant: any definition that
    * leaves timestamp space (to_date, year, date_trunc, casts…)
    * interprets the instant in the session zone, so everything except
    * the identity copy counts. Over other bases, zone-dependent
    * functions or casts to TimestampType count. Unknown base type or
    * unparseable definition ⇒ sensitive (conservative). */
  def tzSensitive(spark: SparkSession, sqlExpr: String,
      baseType: Option[DataType]): Boolean =
    scala.util.Try(spark.sessionState.sqlParser.parseExpression(sqlExpr))
      .toOption match {
      case None => true
      case Some(e) =>
        val usesTzOp = e.exists {
          case f: UnresolvedFunction => TzDependentFns(fnName(f))
          case c: Cast => c.dataType == TimestampType
          case _ => false
        }
        val instantBase = baseType.forall(_ == TimestampType)
        usesTzOp || (instantBase && !e.isInstanceOf[UnresolvedAttribute])
    }

  /** Filters implied on generated columns by `filters` on their base
    * columns. `baseType` resolves a base column's data type (monotone
    * derivations only fire for date/timestamp bases). `recordedTz`
    * resolves the zone a generated column's stored values were computed
    * under: a TZ-sensitive definition derives ONLY when that zone is
    * known — evaluated under THAT zone, not the reader's — because the
    * stored values are f-under-writer-zone and a reader-zone f(v) would
    * prune files that hold matching rows (silent missing rows). */
  def derive(spark: SparkSession, defs: Map[String, String],
      baseType: String => Option[DataType],
      filters: Seq[Filter],
      recordedTz: String => Option[String] = _ => None): Seq[Filter] = {
    val parser = spark.sessionState.sqlParser
    val sessionTz = spark.sessionState.conf.sessionLocalTimeZone
    defs.toSeq.flatMap { case (g, sqlExpr) =>
      val parsed = scala.util.Try(parser.parseExpression(sqlExpr)).toOption
      parsed.toSeq.flatMap { e =>
        soleRef(e) match {
          case Some(base) if deterministic(e) =>
            val evalSession: Option[SparkSession] =
              if (!tzSensitive(spark, sqlExpr, baseType(base))) Some(spark)
              else recordedTz(g) match {
                case Some(z) if z == sessionTz => Some(spark)
                case Some(z) => Some(sessionPinnedTo(spark, z))
                case None => None // unknown writer zone: no sound proof
              }
            if (evalSession.isEmpty) Nil
            else {
            val eval = evalSession.get
            val monotone = monotoneShape(e) && baseType(base).exists(dateLike)
            def f(v: Any): Option[Any] = evalAt(eval, e, v)
            filters.flatMap {
              case EqualTo(`base`, v) if v != null => f(v).map(EqualTo(g, _))
              case In(`base`, vs) =>
                // null arms can never match (3VL), so deriving over the
                // non-null arms is sound; any unevaluable arm → no proof.
                // All arms evaluate in ONE local select (an IN(1000)
                // probe must not pay 1000 analysis round-trips).
                val mapped = evalMany(eval, e, vs.toSeq.filter(_ != null))
                if (mapped.nonEmpty && mapped.forall(_.isDefined))
                  Seq(In(g, mapped.flatten.toArray))
                else Nil
              case GreaterThan(`base`, v) if monotone && v != null =>
                f(v).map(GreaterThanOrEqual(g, _))
              case GreaterThanOrEqual(`base`, v) if monotone && v != null =>
                f(v).map(GreaterThanOrEqual(g, _))
              case LessThan(`base`, v) if monotone && v != null =>
                f(v).map(LessThanOrEqual(g, _))
              case LessThanOrEqual(`base`, v) if monotone && v != null =>
                f(v).map(LessThanOrEqual(g, _))
              case _ => Nil
            }
            }
          case _ => Nil
        }
      }
    }.distinct
  }

  /** A session sharing `spark`'s context but pinned to time zone `z` —
    * the evaluation environment for definitions whose stored values
    * were computed under a different (recorded) zone. Cached per zone:
    * SessionState construction is not free and derive() runs per scan. */
  private val pinned =
    new java.util.concurrent.ConcurrentHashMap[String, SparkSession]()
  private def sessionPinnedTo(spark: SparkSession, z: String): SparkSession =
    pinned.computeIfAbsent(z, { zone =>
      val s = spark.newSession()
      s.conf.set("spark.sql.session.timeZone", zone)
      s
    })

  /** f(v): substitute the base attribute with the literal and evaluate
    * through a one-row local select (no job — LocalTableScan), so
    * function resolution and session time zone match the scan's. */
  private def evalAt(spark: SparkSession, e: Expression, v: Any): Option[Any] =
    evalMany(spark, e, Seq(v)).head

  /** f over many values in ONE analysis + local execution: each value's
    * substituted expression becomes a column of a single one-row select. */
  private def evalMany(spark: SparkSession, e: Expression,
      vs: Seq[Any]): Seq[Option[Any]] =
    if (vs.isEmpty) Nil
    else scala.util.Try {
      val cols = vs.map { v =>
        val lit = Literal(v)
        org.apache.spark.sql.graft.ColumnBridge.column(
          e.transformUp { case _: UnresolvedAttribute => lit })
      }
      val row = spark.range(1).select(cols: _*).collect()(0)
      vs.indices.map(i => if (row.isNullAt(i)) None else Some(row.get(i)))
    }.getOrElse(vs.map(_ => None))
}
