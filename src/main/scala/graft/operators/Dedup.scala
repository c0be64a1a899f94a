package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication operators for a large-scale training-data pipeline.
  *
  * Scale design: every variant except the quadratic baselines goes through
  * candidate generation (hash-groupBy or LSH band bucketing) so the pair
  * join touches only colliding keys — never the O(n²) cross product. Band
  * keys are the shuffle keys; at 100 TB the skew concern is a degenerate
  * band (e.g., millions of identical boilerplate docs) — cap bucket size or
  * salt the band key before the self-join if that shows up in practice.
  */
object Dedup {

  /** Exact dedup by normalized text (hash-groupBy): one shuffle on the
    * group key; keeps the smallest id as the canonical representative.
    * Output: (id, norm_text, group_size) for every KEPT row of a dup group.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), lower(trim(col(textCol))).as("norm_text"))
      .groupBy("norm_text")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("group_size"))
      .select(col(idCol), col("norm_text"), col("group_size"))

  /** MinHash signatures + LSH band keys for each row.
    * Output: (id, shingles, sig, bands).
    */
  def minhashed(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    val r = numHashes / bands
    df.select(col(idCol), charShingles(col(textCol), shingleN).as("shingles"))
      .withColumn("sig", minhashSignature(col("shingles"), numHashes))
      .withColumn("bands", bandKeys(col("sig"), bands, r))
  }

  /** MinHash+LSH near-dup pairs: shingle → minhash → band → bucket-join.
    * Only rows sharing a band key are ever paired; the distinct() collapses
    * pairs that collide in several bands. Output: (a, b, jac) with the
    * *exact* Jaccard of the distinct shingle sets, a < b.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val mh = minhashed(df, idCol, textCol, shingleN, numHashes, bands)
      .persist()
    val banded = mh.select(col(idCol),
      posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_key") === col("y.band_key") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .distinct()
    val sh = mh.select(col(idCol), col("shingles"))
    val inter = size(array_intersect(col("sa"), col("sb")))
    cand
      .join(sh.withColumnRenamed(idCol, "a").withColumnRenamed("shingles", "sa"), "a")
      .join(sh.withColumnRenamed(idCol, "b").withColumnRenamed("shingles", "sb"), "b")
      .select(col("a"), col("b"),
        (inter.cast("double") / (size(col("sa")) + size(col("sb")) - inter)).as("jac"))
  }

  /** SimHash values per row (60-bit, from whitespace-token md5s). */
  def simhashed(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      expr(s"transform(split(trim($textCol), '\\\\s+'), t -> cast(conv(substring(md5(t), 18, 15), 16, 10) as long))").as("hv"))
      .withColumn("sh", simhashFromHashes("hv"))
      .drop("hv")

  /** SimHash near-dup pairs with hamming(a,b) <= maxHamming, a < b.
    * Quadratic baseline; the scale path buckets on bit-chunks of the
    * simhash (pigeonhole: d <= k ⇒ some chunk of k+1 is identical).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val sh = simhashed(df, idCol, textCol)
    val a = sh.select(col(idCol).as("a"), col("sh").as("sha"))
    val b = sh.select(col(idCol).as("b"), col("sh").as("shb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"), hamming(col("sha"), col("shb")).cast("int").as("ham"))
      .where(col("ham") <= maxHamming)
  }

  /** Word n-gram Jaccard similarity over all pairs (exact quadratic
    * baseline — use minhashPairs as the candidate generator at scale).
    * Output: (a, b, jac).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val g = df.select(col(idCol), tokenNgrams(col(textCol), n).as("grams"))
    val a = g.select(col(idCol).as("a"), col("grams").as("ga"))
    val b = g.select(col(idCol).as("b"), col("grams").as("gb"))
    val inter = size(array_intersect(col("ga"), col("gb")))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        (inter.cast("double") / (size(col("ga")) + size(col("gb")) - inter)).as("jac"))
  }

  /** For every row, its single most-similar other row by cosine (embedding
    * near-dup detection). Quadratic baseline with per-key top-1 via window;
    * the scale path feeds candidates from SimilaritySearch.lshBuckets.
    * Output: (id, nn_id, cos_sim).
    */
  def nearestNeighborPerRow(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = df.select(col(idCol), toDoubleArray(col(vecCol)).as("emb"))
      .withColumn("nrm", norm(col("emb")))
    val a = v.select(col(idCol).as("a"), col("emb").as("ea"), col("nrm").as("na"))
    val b = v.select(col(idCol).as("b"), col("emb").as("eb"), col("nrm").as("nb"))
    val w = Window.partitionBy(col("a")).orderBy(col("cos_sim").desc, col("b").asc)
    a.join(b, col("a") =!= col("b"))
      .select(col("a"), col("b"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos_sim"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("a").as(idCol), col("b").as("nn_id"), col("cos_sim"))
  }
}
