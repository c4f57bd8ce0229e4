package graft.ops

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
                     minCos: Double, numHashTables: Int = 4): DataFrame = {
    val v = emb.select(col(idCol), array_to_vector(col(embCol)).as("vec"))
    val nv = new Normalizer().setInputCol("vec").setOutputCol("features").setP(2.0)
      .transform(v).select(col(idCol), col("features"))
      .cache() // reused by fit + both sides of the self-join
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(0.5).setNumHashTables(numHashTables).setSeed(42L)
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
                          shingleN: Int, maxJaccardDist: Double): DataFrame = {
    val sh = df.select(col(idCol),
        TextOps.shingles(TextOps.tokens(col(textCol)), shingleN).as("shs"))
      .filter(size(col("shs")) > 0)
    val tf = new HashingTF().setInputCol("shs").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feat = tf.transform(sh).select(col(idCol), col("features"))
      .cache() // reused by fit + both sides of the self-join
    val lsh = new MinHashLSH().setNumHashTables(5).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(feat)
    model.approxSimilarityJoin(feat, feat, maxJaccardDist, "jaccard_dist")
      .select(col(s"datasetA.$idCol").as("a"), col(s"datasetB.$idCol").as("b"),
        col("jaccard_dist"))
      .filter(col("a") < col("b"))
  }
}
