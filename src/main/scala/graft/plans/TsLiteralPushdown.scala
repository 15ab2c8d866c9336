package graft.plans

import java.time.{ZoneId, ZoneOffset}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Re-enables parquet pushdown for event-time predicates.
  *
  * [[graft.Tables]] normalizes `events.ts` to ns-since-epoch via
  * `unix_micros(cast(ts as timestamp)) * 1000`, which turns literal time
  * predicates (`ts < 1705…e18`) into opaque expressions the parquet source
  * cannot prune with. Because the UTC-pinned NTZ→LTZ cast is the identity on
  * the stored µs value and `unix_micros` is a strictly monotonic bijection
  * TimestampType ↔ µs-long, `unix_micros(cast(c)) * 1000 cmp L` is exactly
  * equivalent to `c cmp Literal(µs, c.dataType)` after integer ceil/floor
  * adjustment of the ns literal. Rewriting comparisons back onto the bare
  * column restores full source pushdown — at 100 TB this is the difference
  * between scanning every row group and min/max-skipping everything outside
  * the query's time range.
  *
  * Installed by [[GraftExtensions]] at session build time (every entry
  * point in this library — Verify, Bench, specs, tools — builds its session
  * `withExtensions`; external deployments use
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`).
  */
object TsLiteralPushdown extends Rule[LogicalPlan] {

  private def isUtc(tz: Option[String]): Boolean =
    tz.exists(z => ZoneId.of(z).normalized() == ZoneOffset.UTC)

  /** `unix_micros` over a timestamp attribute, possibly behind a UTC cast. */
  private object UsOfTs {
    def unapply(e: Expression): Option[Attribute] = e match {
      case UnixMicros(a: Attribute) if a.dataType == TimestampType => Some(a)
      case UnixMicros(c: Cast) =>
        c.child match {
          case a: Attribute
              if c.dataType == TimestampType &&
                (a.dataType == TimestampNTZType || a.dataType == TimestampType) &&
                isUtc(c.timeZoneId) =>
            Some(a)
          case _ => None
        }
      case _ => None
    }
  }

  /** `unix_micros(…) * 1000` in either operand order. */
  private object NsOfTs {
    def unapply(e: Expression): Option[Attribute] = e match {
      case Multiply(UsOfTs(a), Literal(1000L, LongType), _) => Some(a)
      case Multiply(Literal(1000L, LongType), UsOfTs(a), _) => Some(a)
      case _                                                => None
    }
  }

  private def usLit(a: Attribute, us: Long): Literal = Literal(us, a.dataType)
  private def floorUs(ns: Long): Long = Math.floorDiv(ns, 1000L)
  // overflow-safe ceil(ns / 1000) for any Long ns
  private def ceilUs(ns: Long): Long = Math.floorDiv(ns - 1L, 1000L) + 1L

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // µs*1000 < L  ⟺  µs < ceil(L/1000)
    case LessThan(NsOfTs(a), Literal(l: Long, LongType))    => LessThan(a, usLit(a, ceilUs(l)))
    case GreaterThan(Literal(l: Long, LongType), NsOfTs(a)) => LessThan(a, usLit(a, ceilUs(l)))
    // µs*1000 <= L ⟺  µs <= floor(L/1000)
    case LessThanOrEqual(NsOfTs(a), Literal(l: Long, LongType))    => LessThanOrEqual(a, usLit(a, floorUs(l)))
    case GreaterThanOrEqual(Literal(l: Long, LongType), NsOfTs(a)) => LessThanOrEqual(a, usLit(a, floorUs(l)))
    // µs*1000 > L  ⟺  µs > floor(L/1000)
    case GreaterThan(NsOfTs(a), Literal(l: Long, LongType)) => GreaterThan(a, usLit(a, floorUs(l)))
    case LessThan(Literal(l: Long, LongType), NsOfTs(a))    => GreaterThan(a, usLit(a, floorUs(l)))
    // µs*1000 >= L ⟺  µs >= ceil(L/1000)
    case GreaterThanOrEqual(NsOfTs(a), Literal(l: Long, LongType)) => GreaterThanOrEqual(a, usLit(a, ceilUs(l)))
    case LessThanOrEqual(Literal(l: Long, LongType), NsOfTs(a))    => GreaterThanOrEqual(a, usLit(a, ceilUs(l)))
    // equality only when the ns literal is µs-aligned (otherwise unsatisfiable
    // for non-null input; leave it to evaluate naturally)
    case EqualTo(NsOfTs(a), Literal(l: Long, LongType)) if l % 1000L == 0L =>
      EqualTo(a, usLit(a, l / 1000L))
    case EqualTo(Literal(l: Long, LongType), NsOfTs(a)) if l % 1000L == 0L =>
      EqualTo(a, usLit(a, l / 1000L))
  }
}
