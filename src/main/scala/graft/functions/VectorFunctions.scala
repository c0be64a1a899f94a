package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for vector math and sharding.
  *
  * Determinism contract (FIXTURES.md §3): all reductions are *left folds in
  * array-index order* computed in Double, so results are bit-identical to an
  * oracle that sums the same terms in the same order. No sqrt inside the
  * distance (the reference uses *squared* L2 — hnswlib `space='l2'`,
  * `src/datanode/handler.py:46`).
  */
object VectorFunctions {

  /** Cast any numeric array column to array<double> so arithmetic is Double. */
  def toDoubleArray(v: Column): Column = v.cast("array<double>")

  /** Left-fold sum of an array<double> column, in index order. */
  private def foldSum(terms: Column): Column =
    aggregate(terms, lit(0.0), (acc, x) => acc + x)

  /** Dot product a·b — whole-stage-codegen expression; bit-identical to
    * [[dotFold]] (same Double left fold in index order), no per-row array
    * allocation, fuses into the surrounding codegen span.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorDistance.dot(a, b)

  /** Squared L2 distance — reference metric (`src/datanode/handler.py:46`).
    * Codegen expression; bit-identical to [[l2SqFold]].
    */
  def l2Sq(a: Column, b: Column): Column =
    graft.functions.expressions.VectorDistance.l2Sq(a, b)

  /** Declarative fold forms — the executable spec the codegen expression is
    * cross-checked against (and the shape mirrored by the DuckDB oracle).
    */
  def dotFold(a: Column, b: Column): Column =
    foldSum(zip_with(toDoubleArray(a), toDoubleArray(b), (x, y) => x * y))

  def l2SqFold(a: Column, b: Column): Column =
    foldSum(zip_with(toDoubleArray(a), toDoubleArray(b), (x, y) => (x - y) * (x - y)))

  /** Euclidean norm ‖a‖₂. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity a·b / (‖a‖‖b‖). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** x / ‖x‖₂, guarding ‖x‖ = 0 — reference `normalize_vector`
    * (`src/utils/vector_utils.py:15-17`).
    */
  def normalize(v: Column): Column = {
    val dv = toDoubleArray(v)
    val n  = sqrt(foldSum(zip_with(dv, dv, (x, y) => x * y)))
    when(n === lit(0.0), dv).otherwise(transform(dv, x => x / n))
  }

  /** Write-time dimension validation — reference rejects vectors whose dim
    * differs from the configured one (`src/datanode/handler.py:228-232`).
    */
  def dimOk(v: Column, dim: Int): Column = size(v) === lit(dim)

  /** Shard id with CPython `int(md5(key),16) % shards` parity
    * (`src/utils/shared_utils.py:4-7`).
    *
    * Exact for any `shards` that divides 2^32: `x mod m` depends only on
    * `x mod 2^32` when `m | 2^32`, and the low 8 hex digits of the md5 are
    * exactly `x mod 2^32`. The reference uses shards=4.
    */
  def shardId(key: Column, shards: Int): Column = {
    require((1L << 32) % shards == 0,
      s"shardId parity only holds for shard counts dividing 2^32, got $shards")
    pmod(conv(substring(md5(key), 25, 8), 16, 10).cast("long"), lit(shards.toLong))
  }
}
