package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable integer Gram-matrix accumulator over a quantized vector
  * column: ONE pass over the corpus yields n, the per-coordinate sums
  * Σvᵢ and the full outer-product sums Σvᵢvⱼ — everything an exact
  * covariance (and therefore [[graft.operators.Pca]]'s power iteration)
  * needs.
  *
  * Why this exists: the join formulation of the (i,j) product sums —
  * posexplode to (id, i, v) rows, self-join on id, dim²-cell aggregate —
  * keys a shuffle of dim × n rows on BOTH sides before the partial agg.
  * At dim 64 that is a measured-acceptable constant; at 1k–4k-dim
  * production embeddings it is dim× the corpus re-keyed twice, the plan
  * you would not want at 100 TB. Here each map task folds its partition
  * into ONE dim×dim long array (the CmsAgg/MinHashAgg mergeable-state
  * pattern), the shuffle carries one matrix per task regardless of n,
  * and merging is elementwise addExact. The corpus never re-keys, never
  * explodes, and is read exactly once.
  *
  * Buffer layout (flat long array): [dim, n, s₁…s_dim, p₁₁…p_dd]
  * (products row-major, FULL matrix — symmetric, but keeping both halves
  * makes merge/finish branch-free; state is 2 + dim + dim² longs, driver-
  * bounded like every trained artifact here). An empty buffer is the
  * 2-element [0, 0] until the first row fixes dim.
  *
  * Overflow discipline: accumulation uses Math.addExact/multiplyExact,
  * so a corpus whose product sums outgrow int64 fails LOUDLY — exactly
  * where a DuckDB BIGINT oracle would error — never wraps (the silent
  * wrap was the one hazard of the join form's sum(a.v*b.v)).
  *
  * Ragged corpora (rows with differing dimensions) violate the Gram
  * contract and are rejected by name at the first offending row. */
class GramAgg extends Aggregator[Seq[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array(0L, 0L)

  override def reduce(buf0: Array[Long], v: Seq[Long]): Array[Long] = {
    val dim = v.length
    require(dim > 0, "gram: zero-length vector")
    val buf =
      if (buf0(0) == 0L) {
        val b = new Array[Long](2 + dim + dim * dim)
        b(0) = dim
        b
      } else buf0
    require(buf(0) == dim,
      s"gram: ragged corpus — row has dim $dim, corpus has dim ${buf(0)} " +
        "(all embedding rows must share one dimension)")
    buf(1) = Math.addExact(buf(1), 1L)
    // a Seq backed by the row's ArrayData copies out once; the hot loops
    // index a local primitive array
    val a = v.toArray
    var i = 0
    while (i < dim) {
      buf(2 + i) = Math.addExact(buf(2 + i), a(i))
      var j = 0
      val row = 2 + dim + i * dim
      while (j < dim) {
        buf(row + j) = Math.addExact(buf(row + j), Math.multiplyExact(a(i), a(j)))
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a(0) == 0L) b
    else if (b(0) == 0L) a
    else {
      require(a(0) == b(0),
        s"gram: merging buffers of dim ${a(0)} and ${b(0)} — ragged corpus")
      var i = 1 // cell 0 is dim, equal on both sides
      while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
      a
    }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
