package graft.core

/** Content hash that is deterministic ACROSS JVM runs for the payload
  * shapes the lowerings carry: primitives, strings, tuples/case classes,
  * collections, and arrays — including arrays NESTED inside tuples or
  * lists (where plain `##` would fall back to the array's identity hash
  * and differ run to run, making equal-timestamp sort tiebreaks
  * nondeterministic). Used via [[Event.orderKey]] by the lowerings and keyed streaming ops as
  * the equal-time tiebreak key.
  */
object StableHash {
  def apply(v: Any): Int = v match {
    case null => 0
    case a: Array[_] =>
      a.foldLeft(0x9e3779b1)((h, x) => h * 31 + apply(x))
    case p: Product =>
      p.productIterator.foldLeft(p.productPrefix.##)((h, x) => h * 31 + apply(x))
    case it: Iterable[_] =>
      it.foldLeft(0x85ebca77)((h, x) => h * 31 + apply(x))
    case other => other.##
  }
}
