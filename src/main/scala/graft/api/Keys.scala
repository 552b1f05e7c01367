package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Range-checked fixed-width sort-key fields.
  *
  * Several operators encode a composite rank key as a zero-padded
  * fixed-width field (the distributed-prefix-sum keys in
  * win_pareto_share and sample_token_budget): a value outside the
  * field's decimal width would go negative or spill a digit and
  * SILENTLY break the lexicographic / arithmetic order — unreachable
  * at fixture SFs, reachable at 100 TB. These helpers fail fast with
  * a clear message instead, as a per-row `when(...raise_error...)`
  * branch that stays inside whole-stage codegen.
  */
object Keys {

  /** `c` checked into [lo, hiExcl): returns `c` unchanged, or raises
    * at execution time naming the operator and the violated range. */
  def checkedRange(c: Column, lo: Long, hiExcl: Long,
      what: String): Column =
    when(c < lo || c >= hiExcl,
      raise_error(concat(
        lit(s"$what out of fixed-width key range [$lo, $hiExcl): "),
        c.cast("string"))))
      .otherwise(c)
}
