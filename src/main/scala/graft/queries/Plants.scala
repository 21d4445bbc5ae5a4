package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared contract for the composition gates that PLANT synthetic copies
  * inside a corpus under offset ids (q195's exact/near-dup drops, q197's
  * contamination): every natural id must sit BELOW [[IdFloor]], the smallest
  * offset any chain uses. A collision would silently corrupt the gate —
  * duplicate ids violate the MinHash store's unique-id contract and flip
  * survivor sets (q195), or make a "planted" contamination row
  * indistinguishable from a natural doc so the plants-die invariant reads
  * green on the wrong rows (q197) — and the DuckDB oracle mirrors the
  * collision, so the hash compare cannot catch it. Fail loudly instead. */
object Plants {

  /** Smallest planted-id offset across all composition gates. q197 plants
    * at exactly `+IdFloor`; q195 plants at `+IdFloor .. +7M`. */
  val IdFloor = 2000000L

  /** Assert every natural id in `docs` sits below [[IdFloor]]; returns the
    * observed max. Empty tables fail with an explicit message instead of
    * the bare NPE `Row.getLong` would throw on the null max. The max is
    * cast to long IN the aggregation so an int32-typed id column (an
    * int32 parquet doc_id) reports the intended collision/empty message
    * instead of a ClassCastException on the read-back. */
  def requireNaturalIdsBelowFloor(docs: DataFrame, idCol: String,
      what: String): Long = {
    val r = docs.agg(max(col(idCol).cast("long"))).head()
    require(!r.isNullAt(0),
      s"$what: documents table is empty — nothing to plant against")
    val maxNat = r.getLong(0)
    require(maxNat < IdFloor,
      s"$what: natural $idCol $maxNat collides with the planted-id offset " +
        s"space (+$IdFloor..); raise the offsets in the chain AND its oracle")
    maxNat
  }
}
