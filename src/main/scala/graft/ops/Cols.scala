package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression helpers shared across operators. */
private[graft] object Cols {

  /**
   * Let-binding for Column expressions: evaluate `v` ONCE per row and
   * expose it to `f` as a higher-order-function lambda variable.
   *
   * Catalyst performs no common-subexpression elimination inside
   * higher-order lambdas, so `element_at(arr, i)` / `s.substr(i, n)` /
   * `slice(arr, i, n)` over a COMPUTED `arr` re-evaluates the producing
   * expression per ELEMENT — turning a tokenizing split into O(n²·len)
   * per row (measured 6-20× slowdowns at sf0.1; worse with regexes).
   * `bound` wraps the value in a single-element array and binds it
   * through `transform`, whose lambda variable IS a materialized value:
   * every use inside `f` is then an O(1) reference. Works for any type.
   */
  def bound(v: Column)(f: Column => Column): Column =
    element_at(transform(array(v), x => f(x)), 1)
}
