package graft

import scala.collection.concurrent.TrieMap

/** Attribution registry for the APP-SCOPED cache artifacts (persisted
  * index/side tables: minhash shingle+signature tables, verified
  * near-dup pairs, historical cluster labels, IVF/PQ indexes, staged
  * pagerank graphs, HLL register grids). These are deliberate design —
  * a production pipeline materializes its indexes once per corpus
  * snapshot — but they make a RAW per-query bench number misleading:
  * the first consumer pays the build, later consumers read the
  * artifact. Each cache helper reports every read (and whether it was
  * the building miss); [[Bench]] then tags a timed query `cached` when
  * it read an artifact an EARLIER query built, naming the builder, so
  * the timings file separates build cost from probe cost without
  * changing what is measured.
  */
object CacheRegistry {
  /** artifact name -> query that built it (first miss wins). */
  private val builders = TrieMap.empty[String, String]
  /** query name -> artifact names it read. */
  private val reads = TrieMap.empty[String, Set[String]]
  @volatile private var current: String = ""

  /** The query about to run (set by Bench/Verify drivers; empty when
    * cache traffic is unattributed, e.g. tests).
    */
  def setCurrent(q: String): Unit = current = q

  /** Record that the running query read `artifact` (hit or miss). */
  def read(artifact: String): Unit = {
    val q = current
    if (q.nonEmpty)
      reads.updateWith(q)(s => Some(s.getOrElse(Set.empty) + artifact))
  }

  /** Record that the running query is BUILDING `artifact` (call inside
    * the getOrElseUpdate default, which only evaluates on a miss).
    */
  def built(artifact: String): Unit = {
    val q = current
    if (q.nonEmpty) builders.putIfAbsent(artifact, q)
  }

  /** Artifacts `q` read that an earlier, different query built:
    * artifact -> builder. Empty map = `q`'s number is standalone.
    */
  def servedFrom(q: String): Map[String, String] =
    reads.getOrElse(q, Set.empty).iterator
      .flatMap(a => builders.get(a).filter(_ != q).map(a -> _))
      .toMap
}
