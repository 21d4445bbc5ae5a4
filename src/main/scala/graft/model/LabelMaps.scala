package graft.model

/** Label-map (category dimension) algebra — driver-side, maps are O(100).
  * Semantics from lours/utils/label_map_merger.py:9-69. */
object LabelMaps {

  /** Outer merge: union of both maps; the same id mapping to two different
    * names is an error (label_map_merger.py:49-69). */
  def mergeOuter(a: Map[Int, String], b: Map[Int, String]): Map[Int, String] = {
    val conflicts = a.keySet.intersect(b.keySet).filter(k => a(k) != b(k))
    require(conflicts.isEmpty,
      s"label map conflict on ids ${conflicts.toSeq.sorted.mkString(",")}: " +
        conflicts.toSeq.sorted.map(k => s"$k -> '${a(k)}' vs '${b(k)}'").mkString("; "))
    a ++ b
  }

  /** Inner merge: require one map to be a subset of the other; result is the
    * larger map (label_map_merger.py:29-48). */
  def mergeInner(a: Map[Int, String], b: Map[Int, String]): Map[Int, String] = {
    val small = if (a.size <= b.size) a else b
    val big = if (a.size <= b.size) b else a
    require(small.forall { case (k, v) => big.get(k).contains(v) },
      "label map inner merge: smaller map is not a subset of the larger")
    big
  }

  /** Assert bijectivity (utils/testing.py:580-589). */
  def assertBijective(m: Map[Int, String]): Unit = {
    val dupNames = m.values.groupBy(identity).filter(_._2.size > 1).keys
    require(dupNames.isEmpty, s"label map not bijective: duplicate names ${dupNames.mkString(",")}")
  }

}
