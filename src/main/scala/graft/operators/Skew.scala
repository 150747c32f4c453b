package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware equi-join. When one join key carries a disproportionate
  * share of the fact rows, a plain hash join puts that whole key in
  * one task. Salting scatters the hot key's rows across `salt`
  * sub-keys and replicates the (smaller) build side once per salt —
  * turning one straggler task into `salt` even tasks. AQE's skew-join
  * handles sort-merge cases adaptively; explicit salting remains the
  * tool when the build side must replicate (broadcast-ineligible) or
  * the skew is known up front.
  */
object Skew {

  /** Equi-join `facts` (skewed on `key`) with `dim` (small enough to
    * replicate `salt` times). Result equals the plain equi-join.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 0)
    // deterministic scatter: hash the whole fact row across salts
    val factCols = facts.columns.map(col)
    val salted = facts.withColumn("__salt",
      pmod(xxhash64(factCols.toIndexedSeq: _*), lit(salt.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
