package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, MinHashLSH, Normalizer}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-backed scale paths for similarity/dedup — the bucketed
  * alternatives to the exact kernels in [[Similarity]]/[[Dedup]]. These
  * are approximate (hash-based candidate generation) and seeded for
  * reproducibility; the driver records a rows-only check for them, the
  * exact kernels carry the oracle.
  */
object MLlibOps {

  /** ANN via random-projection LSH on L2-normalized vectors: for unit
    * vectors `||a-b||² = 2 - 2·cos(a,b)`, so a Euclidean radius is a
    * cosine floor. `approxSimilarityJoin` shuffles on the hash-bucket
    * key — candidate generation is an equi join, never all-pairs.
    */
  def annCosinePairs(emb: DataFrame, idCol: String, embCol: String,
                     minCos: Double, numHashTables: Int = 4,
                     bucketLength: Double = 0.5): DataFrame = {
    val v = emb.select(col(idCol), array_to_vector(col(embCol)).as("vec"))
    val nv = new Normalizer().setInputCol("vec").setOutputCol("features").setP(2.0)
      .transform(v).select(col(idCol), col("features"))
      .cache() // reused by fit + both sides of the self-join
    nv.count() // eager: racing subtrees of one action must hit the cache
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(nv)
    val maxDist = math.sqrt(math.max(0d, 2d - 2d * minCos))
    model.approxSimilarityJoin(nv, nv, maxDist, "dist")
      .select(col(s"datasetA.$idCol").as("a"), col(s"datasetB.$idCol").as("b"),
        col("dist"))
      .filter(col("a") < col("b"))
  }

  /** MinHash-LSH near-dup join over hashed shingle sets (Jaccard
    * distance ≤ `maxJaccardDist`). Input: (id, text).
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          shingleN: Int, maxJaccardDist: Double,
                          numHashTables: Int = 5): DataFrame = {
    val sh = df.select(col(idCol),
        TextOps.shingles(TextOps.tokens(col(textCol)), shingleN).as("shs"))
      .filter(size(col("shs")) > 0)
    val tf = new HashingTF().setInputCol("shs").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(sh).select(col(idCol), col("features"))
      .cache() // reused by fit + both sides of the self-join
    feat.count() // eager: racing subtrees of one action must hit the cache
    val lsh = new MinHashLSH().setNumHashTables(numHashTables).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(feat)
    model.approxSimilarityJoin(feat, feat, maxJaccardDist, "jaccard_dist")
      .select(col(s"datasetA.$idCol").as("a"), col(s"datasetB.$idCol").as("b"),
        col("jaccard_dist"))
      .filter(col("a") < col("b"))
  }

  /** The production composition: MLlib ANN *candidates* verified by the
    * exact quantized cosine ([[Similarity.verifyPairs]]). The candidate
    * radius is widened by `candSlack` so MLlib's float-vector distance
    * filter cannot clip a pair sitting exactly at the exact-cosine
    * threshold; precision is restored by the verify stage, and recall at
    * `minCos` is 1 − (1 − p)^numHashTables per pair — choose
    * `numHashTables`/`bucketLength` for the corpus's margin.
    */
  def annVerifiedNearDups(emb: DataFrame, idCol: String, embCol: String,
                          minCos: Double, candSlack: Double = 0.1,
                          numHashTables: Int = 12,
                          bucketLength: Double = 2.0): DataFrame = {
    val cand = annCosinePairs(emb, idCol, embCol, minCos - candSlack,
        numHashTables, bucketLength)
      .select(col("a"), col("b"))
    Similarity.verifyPairs(cand, Similarity.quantize(emb, idCol, embCol), idCol, minCos)
  }

  /** Seeded KMeans cell assignment over an embedding column: the
    * fitted-centroid flavor of the IVF inverted file
    * ([[Similarity.ivfNearDupPairs]] uses fixed seed ROWS so its oracle
    * can mirror the assignment relationally; at 100 TB these fitted
    * centroids replace them), and the MLlib global-clustering substitute
    * for M5 next to the per-file kernel
    * ([[graft.pipeline.Clustering.clusterOne]]). Deterministic for a
    * fixed seed and input.
    */
  def kmeansCells(emb: DataFrame, idCol: String, embCol: String, k: Int,
                  seed: Long = 42L): DataFrame = {
    val v = emb.select(col(idCol), array_to_vector(col(embCol)).as("features"))
      .cache()
    v.count() // eager: reused by fit + transform
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(v)
    model.transform(v).select(col(idCol), col("cell").cast("long").as("cell"))
  }

  /** MLlib MinHash-LSH *candidates* verified by the exact Jaccard over
    * the true shingle table ([[Dedup.jaccardVerify]]). `distSlack` widens
    * the candidate distance so HashingTF feature collisions cannot clip a
    * boundary pair; the verify stage computes the exact set Jaccard.
    */
  def minhashVerifiedNearDups(df: DataFrame, idCol: String, textCol: String,
                              shingleN: Int, minJaccard: Double,
                              distSlack: Double = 0.1,
                              numHashTables: Int = 6): DataFrame = {
    val cand = minhashNearDupPairs(df, idCol, textCol, shingleN,
        (1.0 - minJaccard) + distSlack, numHashTables)
      .select(col("a"), col("b"))
    Dedup.jaccardVerify(cand,
      TextOps.shingleTable(df, idCol, textCol, shingleN), idCol, minJaccard)
  }
}
