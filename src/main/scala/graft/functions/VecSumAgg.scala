package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Elementwise SUM of a float-vector column plus the row count, as ONE
  * array-typed aggregate — the mean-update primitive of [[graft.operators
  * .Ivf]] float-Lloyd training.
  *
  * Why one aggregate instead of dim `avg(element_at(v, i))` columns: the
  * per-coordinate spelling builds dim aggregate EXPRESSIONS, so analysis/
  * optimization/codegen all grow linearly with dim and at the k-means
  * regime this library targets (dim 1k–4k, reachable since NearestCellF
  * removed the cell cap) that is the same janino method-size blowup the
  * tiled Gram work documented for per-pair slices (ADVICE r13). Here the
  * plan carries ONE ObjectHashAggregate whose buffer is a (1+dim)-double
  * array — planning and generated-code size are dim-INDEPENDENT, and the
  * shuffle still carries k rows × (dim+1) doubles, never the corpus.
  *
  * Buffer layout (flat double array): [n, s(1..dim)]. The zero buffer is
  * the 1-element [0] until the first row fixes dim. Widening: each float
  * coordinate widens to double before accumulation — the same arithmetic
  * as Spark's `avg` over `element_at` (double sum ÷ long count), so the
  * caller's sums(i)/n reproduces the retired spelling up to merge-order
  * ulps (which the float-Lloyd digest pin already rounds through).
  *
  * Ragged corpora are rejected BY NAME at the first offending row (the
  * [[GramTileAgg]] convention): the retired spelling let element_at
  * return null past a short row's end, avg yield null, and the driver
  * read throw an opaque NullPointerException. */
class VecSumAgg
    extends Aggregator[Seq[Float], Array[Double], Array[Double]] {

  override def zero: Array[Double] = Array(0.0)

  override def reduce(buf0: Array[Double], v: Seq[Float]): Array[Double] = {
    val a = v.toArray
    val dim = a.length
    require(dim > 0, "vec sum: empty embedding row (need at least 1 " +
      "coordinate)")
    val buf =
      if (buf0.length == 1) new Array[Double](1 + dim)
      else buf0
    require(buf.length == 1 + dim,
      s"vec sum: ragged corpus — row has dim $dim, aggregate has dim " +
        s"${buf.length - 1} (all embedding rows must share one dimension)")
    buf(0) += 1.0
    var i = 0
    while (i < dim) {
      buf(1 + i) += a(i).toDouble
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.length == 1) b
    else if (b.length == 1) a
    else {
      require(a.length == b.length,
        s"vec sum: merging dim ${a.length - 1} with dim ${b.length - 1} — " +
          "ragged corpus")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
