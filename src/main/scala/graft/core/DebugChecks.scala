package graft.core

/** Opt-in runtime validation of caller-asserted preconditions.
  *
  * Some operators accept data-shape assertions from the caller
  * (e.g. Dedup.ngramContainment's `uniqueBlockPerId`, the bounded
  * per-order basket size a_basket_pairs' expansion relies on). Wrongly
  * asserted, they change results or concentrate work silently — so the
  * checks exist, but behind a flag: they cost extra jobs and must never
  * run inside a timed production path.
  *
  * Enabled with env `SPARK_GRAFT_CHECK_PRECONDITIONS=1` or system
  * property `graft.check.preconditions=1` (the property lets forked
  * test JVMs toggle it per-suite).
  */
object DebugChecks {
  def enabled: Boolean =
    sys.props.get("graft.check.preconditions")
      .orElse(sys.env.get("SPARK_GRAFT_CHECK_PRECONDITIONS"))
      .exists(v => v == "1" || v == "true")
}
