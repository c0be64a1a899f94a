package graft.multimodal

import java.io.{DataInputStream, DataOutputStream}

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** A REAL model-artifact-backed embedder behind the image2vec/text2vec
  * seam — the missing half of the reference's CLIP path
  * (`clip/embedding.py:39-93`): weights that live as a versioned artifact
  * on shared storage, are loaded ONCE per executor JVM, and turn the raw
  * featurizer outputs into unit-norm `outDim`-d vectors in a shared
  * embedding space.
  *
  * No model runtime (ONNX/torch) exists in this container, so the model
  * is a hand-written dual-tower projection network — per tower a full
  * affine→ReLU→affine MLP over the decode featurizer's output, L2
  * normalized (the CLIP output contract, `embedding.py:66-67`). The
  * weights are DATA, not code: generated deterministically (or trained
  * elsewhere), serialized to one binary artifact, `_SUCCESS`-gated like
  * every other index artifact in this engine, and loaded per executor
  * through [[Embedder.Registry]]. That exercises every part of the seam
  * a real CLIP deployment needs:
  *
  *   - artifact lifecycle: `save` → `_SUCCESS` → `load` fails loud on a
  *     missing/partial artifact (no silent fallback to fake features);
  *   - per-executor weight residency: the registry caches by (dir,
  *     modification time), so a 1-GB weight file is read once per JVM,
  *     not once per task — `mapPartitions` batches ride the cached model;
  *   - dual towers, one space: image and text towers share `outDim`, so
  *     text→image retrieval runs on the same KNN operators as every
  *     other embedding column.
  *
  * CLIP-swap recipe (the production path): keep `save`/`load`/`Registry`
  * and [[embedMedia]]/[[embedText]] exactly as they are, and replace ONLY
  * [[Tower.forward]]'s MLP with an ONNX-runtime session call (the session
  * object takes the registry's place as the per-JVM cached value; its
  * `.run` consumes the same `Array[Float]` featurizer batch), swap the
  * grid-pool featurizer for CLIP's resize+center-crop+CHW normalize, and
  * write the exported weights where `save` writes the towers. Schema,
  * partitioning, batch shape, and every downstream operator (KNN, dedup,
  * decontamination) are unchanged.
  */
object Embedder {

  /** One tower: x(inDim) → relu(W1·x + b1)(hiddenDim) → W2·h + b2
    * (outDim) → L2 normalize. Weight matrices are flattened row-major
    * (`w1(r * inDim + c)`).
    */
  final case class Tower(inDim: Int, hiddenDim: Int, outDim: Int,
      w1: Array[Float], b1: Array[Float],
      w2: Array[Float], b2: Array[Float]) {
    require(w1.length == hiddenDim * inDim && b1.length == hiddenDim &&
      w2.length == outDim * hiddenDim && b2.length == outDim,
      s"Tower weight shapes inconsistent with ($inDim, $hiddenDim, $outDim)")

    /** Deterministic forward pass; fails loud on a featurizer/model
      * dimension mismatch (the silent-truncate alternative would quietly
      * embed garbage).
      */
    def forward(x: Array[Float]): Array[Float] = {
      require(x.length == inDim,
        s"Tower.forward: input dim ${x.length} != model inDim $inDim — " +
          "featurizer and model artifact disagree")
      val h = new Array[Double](hiddenDim)
      var r = 0
      while (r < hiddenDim) {
        var acc = b1(r).toDouble
        var c = 0
        val off = r * inDim
        while (c < inDim) { acc += w1(off + c) * x(c); c += 1 }
        h(r) = if (acc > 0) acc else 0.0 // ReLU
        r += 1
      }
      val y = new Array[Double](outDim)
      var ss = 0.0
      r = 0
      while (r < outDim) {
        var acc = b2(r).toDouble
        var c = 0
        val off = r * hiddenDim
        while (c < hiddenDim) { acc += w2(off + c) * h(c); c += 1 }
        y(r) = acc
        ss += acc * acc
        r += 1
      }
      val nrm = math.sqrt(ss)
      val out = new Array[Float](outDim)
      r = 0
      while (r < outDim) {
        out(r) = (if (nrm == 0.0) y(r) else y(r) / nrm).toFloat
        r += 1
      }
      out
    }
  }

  /** The dual-tower artifact: image and text towers sharing an output
    * space (`imageTower.outDim == textTower.outDim` enforced at save).
    */
  final case class DualTower(image: Tower, text: Tower)

  // ---- deterministic local generation (no network, no runtime) ----

  /** SplitMix64 — the same tiny deterministic PRNG the fixtures use;
    * good enough spectral properties for init weights, and bit-stable
    * across JVMs (float ops only at the final scale step).
    */
  private def splitMix(state: Long): (Long, Long) = {
    val z0 = state + 0x9e3779b97f4a7c15L
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z0, z ^ (z >>> 31))
  }

  /** A deterministically seeded tower: weights uniform in
    * ±sqrt(6/(fanIn+fanOut)) (Glorot), biases zero — a REAL randomly
    * projected embedding model (random projections preserve relative
    * geometry, Johnson-Lindenstrauss), generated locally with no
    * network. Two calls with the same arguments are bit-identical.
    */
  def seededTower(seed: Long, inDim: Int, hiddenDim: Int,
      outDim: Int): Tower = {
    require(inDim > 0 && hiddenDim > 0 && outDim > 0,
      s"tower dims must be positive: ($inDim, $hiddenDim, $outDim)")
    var s = seed
    def uniform(n: Int, limit: Double): Array[Float] = {
      val a = new Array[Float](n)
      var i = 0
      while (i < n) {
        val (ns, bits) = splitMix(s)
        s = ns
        // 53-bit mantissa → [0, 1) → [-limit, limit)
        a(i) = (((bits >>> 11) * 1.1102230246251565e-16) * 2.0 * limit -
          limit).toFloat
        i += 1
      }
      a
    }
    val l1 = math.sqrt(6.0 / (inDim + hiddenDim))
    val l2 = math.sqrt(6.0 / (hiddenDim + outDim))
    Tower(inDim, hiddenDim, outDim,
      uniform(hiddenDim * inDim, l1), new Array[Float](hiddenDim),
      uniform(outDim * hiddenDim, l2), new Array[Float](outDim))
  }

  // ---- artifact serialization (Hadoop FS — local now, HDFS/S3 at scale) ----

  private val Magic = 0x47504d31 // "GPM1" — graft projection model v1

  private def writeTower(out: DataOutputStream, t: Tower): Unit = {
    out.writeInt(t.inDim); out.writeInt(t.hiddenDim); out.writeInt(t.outDim)
    Seq(t.w1, t.b1, t.w2, t.b2).foreach { a =>
      out.writeInt(a.length)
      a.foreach(out.writeFloat)
    }
  }

  private def readTower(in: DataInputStream): Tower = {
    val (i, h, o) = (in.readInt(), in.readInt(), in.readInt())
    def arr(): Array[Float] = {
      val n = in.readInt()
      require(n >= 0 && n <= (1 << 28), s"corrupt model artifact: array length $n")
      val a = new Array[Float](n)
      var j = 0
      while (j < n) { a(j) = in.readFloat(); j += 1 }
      a
    }
    Tower(i, h, o, arr(), arr(), arr(), arr())
  }

  /** Persist the dual-tower artifact: `dir/model.bin` then `dir/_SUCCESS`
    * — the write is not visible to [[load]] until the marker lands (the
    * store/index artifact discipline).
    */
  def save(conf: Configuration, dir: String, model: DualTower): Unit = {
    require(model.image.outDim == model.text.outDim,
      "dual-tower artifact requires a shared output space: image outDim " +
        s"${model.image.outDim} != text outDim ${model.text.outDim}")
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p)
    val out = new DataOutputStream(fs.create(new Path(p, "model.bin"), true))
    try {
      out.writeInt(Magic)
      writeTower(out, model.image)
      writeTower(out, model.text)
    } finally out.close()
    fs.create(new Path(p, "_SUCCESS"), true).close()
  }

  /** Load the artifact; fails loud when the dir, the `_SUCCESS` marker,
    * or the magic is missing — a partially written model must never
    * silently embed.
    */
  def load(conf: Configuration, dir: String): DualTower = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    require(fs.exists(new Path(p, "_SUCCESS")),
      s"no complete embedder artifact at $dir (missing _SUCCESS)")
    val in = new DataInputStream(fs.open(new Path(p, "model.bin")))
    try {
      require(in.readInt() == Magic, s"$dir/model.bin is not a graft " +
        "projection-model artifact (bad magic)")
      DualTower(readTower(in), readTower(in))
    } finally in.close()
  }

  /** Per-JVM model residency: each executor loads the weight file ONCE
    * (keyed by artifact dir + `_SUCCESS` modification time, so a
    * re-saved artifact is picked up, not served stale), and every task /
    * partition on that JVM shares the loaded arrays. This is the seam a
    * CLIP ONNX session occupies in production — the cached value becomes
    * the session object, nothing else moves.
    */
  object Registry {
    // ONE entry per dir — (mtime, model), swapped atomically on artifact
    // re-save. Keying by (dir, mtime) would retain every stale DualTower
    // (large weight arrays) forever in a long-lived executor JVM; here a
    // re-save replaces, so residency is bounded by the number of distinct
    // artifact dirs actually served.
    private val cache = TrieMap.empty[String, (Long, DualTower)]

    def get(dir: String): DualTower = {
      val conf = new Configuration()
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      val marker = new Path(p, "_SUCCESS")
      require(fs.exists(marker),
        s"no complete embedder artifact at $dir (missing _SUCCESS)")
      val mtime = fs.getFileStatus(marker).getModificationTime
      cache.get(dir) match {
        case Some((m, model)) if m == mtime => model
        case _ =>
          // two tasks racing a swap both load a valid model; last put wins
          val model = load(conf, dir)
          cache.put(dir, (mtime, model))
          model
      }
    }
  }

  /** Embedded media row: unit-norm `outDim`-d vector per payload, plus
    * whether the REAL decoder produced the featurizer input (`decoded`)
    * or the byte-hash fallback did — a model over fallback features is
    * still deterministic but not semantic, and downstream curation
    * should know.
    */
  final case class MediaEmbedding(key: String, mediaType: String,
      decoded: Boolean, embedding: Array[Float])

  /** image2vec through the LOADED model (reference
    * `clip/embedding.py:39-68` shape): per-partition model residency via
    * [[Registry]], real decode → featurizer → image-tower forward.
    * Audio payloads ride the same tower contract through the PCM
    * featurizer; payloads no JVM decoder accepts get the byte-hash
    * featurizer with `decoded = false`.
    */
  def embedMedia(ds: Dataset[Multimodal.MediaRecord],
      modelDir: String): Dataset[MediaEmbedding] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      val model = Registry.get(modelDir) // once per JVM, shared by tasks
      val dim = model.image.inDim
      rows.map { r =>
        val feat = r.mediaType match {
          case "image" => Multimodal.imageFeatures(r.bytes, dim).map(_._3)
          case "audio" => Multimodal.audioFeatures(r.bytes, dim).map(_._3)
          case _ => None
        }
        MediaEmbedding(r.key, r.mediaType, feat.isDefined,
          model.image.forward(
            feat.getOrElse(Multimodal.byteHashFeatures(r.bytes, dim))))
      }
    }
  }

  /** text2vec through the loaded model's TEXT tower (reference
    * `clip/embedding.py:70-93`): hashed-token featurizer → forward.
    * Output schema (id, embedding) slots directly into the KNN/dedup
    * operators — text→image retrieval is [[embedText]] ×
    * [[embedMedia]] under one KNN join.
    */
  def embedText(df: DataFrame, idCol: String, textCol: String,
      modelDir: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("string").as("key"), col(textCol).as("text"))
      .as[(String, String)]
      .mapPartitions { rows =>
        val model = Registry.get(modelDir)
        val dim = model.text.inDim
        rows.map { case (k, t) =>
          (k, model.text.forward(Multimodal.textFeatures(
            Option(t).getOrElse(""), dim)))
        }
      }
      .toDF(idCol, "embedding")
  }
}
