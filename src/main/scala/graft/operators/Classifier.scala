package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** Quality-classifier training ON the cluster — the fastText-shaped
  * filter of the GPT-3 / CCNet curation recipe: logistic regression over
  * hashed unigram+bigram features, trained by full-batch gradient
  * descent where each iteration is ONE scan of a featurized corpus plus
  * ONE bounded hash-agg, then applied as a zero-shuffle codegen scoring
  * pass. The trained-classifier sibling of [[Dsir]] (which selects
  * without training); both share the bounded-bucket feature space and
  * the literal-weight-array scoring idiom.
  *
  * Scale shape:
  *   - FEATURIZE once: tokens → gram occurrences → bucket ids
  *     (`Array[Int]` per doc, [[Dsir.grams]] + md5 buckets) — one scan,
  *     persisted for the training loop (scoped, unpersisted in
  *     `finally`). The md5 cost is paid once, not per iteration.
  *   - Each GD iteration: margin = row-local fold of the doc's bucket
  *     ids against the literal weight array (fastText mean-of-weights),
  *     residual = sigmoid(margin) − y, gradient = explode(buckets) →
  *     groupBy(bucket) sum — the shuffle output is ≤ `buckets` rows at
  *     ANY corpus size, map-side combined. Weights update driver-side:
  *     an artifact of `buckets` doubles, like a PQ codebook.
  *   - SCORE: the same row-local fold — zero Exchange, whole-stage
  *     codegen, embarrassingly parallel over 100 TB.
  *
  * Floats: gradients are cross-partition Double sums, so trained weights
  * are run-deterministic only to the ulp (FIXTURES.md §3) — the
  * classifier family is therefore ScalaTest-pinned (separation, AUC,
  * held-out generalization), not oracle-checked; the EVAL side of the
  * story (confusion matrices, F1) is oracle-pinned by q119–q121.
  */
object Classifier {

  /** Trained model: `weights(b)` per feature bucket + bias. */
  case class LogRegModel(weights: Array[Double], bias: Double,
      buckets: Int, salt: String)

  /** (idCol, y, bks ARRAY<INT>) — label + the doc's gram-occurrence
    * bucket ids (multiplicity kept: the count vector in sparse form).
    */
  def featurize(docs: DataFrame, idCol: String, textCol: String,
      labelCol: Column, buckets: Int, salt: String): DataFrame =
    docs
      .select(col(idCol), labelCol.cast("double").as("y"),
        TextFunctions.wsTokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("y"),
        transform(Dsir.grams(col("__toks")),
          g => TextFunctions.md5Bucket(g, buckets, salt).cast("int"))
          .as("bks"))

  /** Row-local decision margin: bias + mean of the doc's bucket weights
    * (the fastText averaging — length-invariant). `w` rides the plan as
    * one literal array; `bks` is never empty (wsTokens of any string has
    * >= 1 element).
    */
  private def marginCol(w: Array[Double], bias: Double): Column =
    lit(bias) +
      aggregate(col("bks"), lit(0.0),
        (acc, b) => acc + element_at(lit(w), b + 1)) /
        size(col("bks")).cast("double")

  /** Numerically-safe sigmoid of a clamped margin. */
  private def sigmoidCol(m: Column): Column = {
    val c = greatest(lit(-30.0), least(lit(30.0), m))
    lit(1.0) / (lit(1.0) + exp(-c))
  }

  /** Full-batch gradient descent for `iters` rounds. Each round reads the
    * persisted featurized frame once; the per-bucket gradient shuffle is
    * bounded by `buckets`. L2 regularization on weights (not bias).
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
      labelCol: Column, buckets: Int = 4096, iters: Int = 30,
      lr: Double = 2.0, l2: Double = 1e-6,
      salt: String = "qcls:"): LogRegModel = {
    require(buckets >= 2 && buckets <= (1 << 20),
      s"classifier: buckets $buckets out of range [2, 2^20]")
    require(iters >= 1 && lr > 0, s"classifier: iters $iters / lr $lr invalid")
    val feats = featurize(docs, idCol, textCol, labelCol, buckets, salt)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = feats.count().toDouble
      require(n > 0, "classifier: empty training frame")
      var w = Array.fill(buckets)(0.0)
      var bias = 0.0
      var it = 0
      while (it < iters) {
        // residual r = p − y per row, spread over the doc's buckets with
        // the same 1/|bks| factor the margin used (chain rule of the mean)
        val withR = feats.withColumn("__r",
          sigmoidCol(marginCol(w, bias)) - col("y"))
        val grad = withR
          .select((col("__r") / size(col("bks")).cast("double")).as("__rw"),
            explode(col("bks")).as("b"))
          .groupBy("b").agg(sum(col("__rw")).as("g"))
          .collect()
        val gw = Array.fill(buckets)(0.0)
        grad.foreach(r => gw(r.getInt(0)) = r.getDouble(1) / n)
        // the bias gradient IS the bucket gradients' total: each doc
        // contributes |bks| x (r/|bks|) = r across its buckets — no
        // second scan of the featurized frame needed
        val biasGrad = grad.iterator.map(_.getDouble(1)).sum / n
        var b = 0
        while (b < buckets) {
          w(b) -= lr * (gw(b) + l2 * w(b)); b += 1
        }
        bias -= lr * biasGrad
        it += 1
      }
      LogRegModel(w, bias, buckets, salt)
    } finally feats.unpersist()
  }

  /** Score every document: (idCol, quality_score ∈ (0,1)). The apply
    * pass is the codegen [[graft.functions.expressions.DsirWeightD]]
    * kernel — one digest per gram, zero Exchange (plan-pinned), the
    * 100-TB production path; [[scoreFold]] is its declarative twin and
    * ClassifierSpec pins bit-identity.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: LogRegModel): DataFrame =
    docs
      .select(col(idCol),
        TextFunctions.wsTokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        graft.functions.expressions.DsirWeightUtil
          .columnD(col("__toks"), model.weights, model.salt).as("__nw"))
      .select(col(idCol),
        sigmoidCol(lit(model.bias) +
          col("__nw.wsum") / col("__nw.n_grams").cast("double"))
          .as("quality_score"))

  /** Declarative fold twin of [[score]] (executable spec of the kernel). */
  def scoreFold(docs: DataFrame, idCol: String, textCol: String,
      model: LogRegModel): DataFrame =
    docs
      .select(col(idCol),
        TextFunctions.wsTokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        transform(Dsir.grams(col("__toks")),
          g => TextFunctions.md5Bucket(g, model.buckets, model.salt)
            .cast("int")).as("bks"))
      .select(col(idCol),
        sigmoidCol(marginCol(model.weights, model.bias)).as("quality_score"))

  /** The curation gate: keep documents the trained classifier scores at
    * or above `threshold` — the GPT-3 "similarity to the high-quality
    * reference" filter, as one map-only pass.
    */
  def filterByQuality(docs: DataFrame, idCol: String, textCol: String,
      model: LogRegModel, threshold: Double): DataFrame =
    docs.join(
      score(docs, idCol, textCol, model)
        .where(col("quality_score") >= threshold)
        .select(col(idCol)),
      Seq(idCol), "left_semi")
}
