package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators over document collections: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash. Designed scale-first:
  *
  *  - exact dedup is one hash-aggregate on a fingerprint;
  *  - the Jaccard path only ever joins on a shingle/bucket equi key, so
  *    Catalyst plans shuffled hash joins — no quadratic cross products;
  *  - MinHash+LSH bounds candidate generation: collisions require two
  *    docs to agree on a band's minimum hash, which happens with
  *    probability ≈ Jaccard per band — random pairs virtually never
  *    collide, so the verify stage touches O(near-dups), not O(n²).
  */
object Dedup {

  /** Exact-duplicate groups by fingerprint: (fingerprint, n_dups,
    * canonical = min id). Input: (id, fp).
    */
  def exactGroups(df: DataFrame, idCol: String, fpCol: String): DataFrame =
    df.groupBy(col(fpCol))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("canonical"))
      .filter(col("n_dups") > 1)

  /** Per-doc distinct-shingle counts, the denominator input of Jaccard. */
  private def shingleCounts(sd: DataFrame, idCol: String): DataFrame =
    sd.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))

  /** Jaccard for candidate pairs: join the pair list back to the shingle
    * table on the equi (id, shingle) keys, count commons, divide exact
    * integers. Input `cand`: (a, b) with a < b; `sd`: (id, shingle)
    * distinct.
    */
  def jaccardVerify(cand: DataFrame, sd: DataFrame, idCol: String,
                    minJaccard: Double): DataFrame = {
    val n = shingleCounts(sd, idCol)
    val commons = cand
      .join(sd.select(col(idCol).as("a"), col("shingle")), "a")
      .join(sd.select(col(idCol).as("b"), col("shingle").as("shingle_b")),
        Seq("b"))
      .filter(col("shingle") === col("shingle_b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
    commons
      .join(n.select(col(idCol).as("a"), col("n_sh").as("na")), "a")
      .join(n.select(col(idCol).as("b"), col("n_sh").as("nb")), "b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("common"), col("jaccard"))
  }

  /** Exhaustive n-gram Jaccard dedup: candidates = pairs sharing at least
    * one shingle (equi join on the shingle), then verify. Exact but
    * O(pairs-sharing-a-shingle); use [[minhashLshPairs]] at scale.
    */
  def ngramJaccardPairs(sd0: DataFrame, idCol: String, minJaccard: Double): DataFrame = {
    // One self-join on the shingle key gives common counts directly —
    // no candidate materialization + re-join (the LSH variant needs the
    // split because its candidates come from bucket collisions instead).
    val sd = sd0.cache()
    val n = shingleCounts(sd, idCol)
    val commons = sd.select(col(idCol).as("a"), col("shingle"))
      .join(sd.select(col(idCol).as("b"), col("shingle")), Seq("shingle"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
    commons
      .join(n.select(col(idCol).as("a"), col("n_sh").as("na")), "a")
      .join(n.select(col(idCol).as("b"), col("n_sh").as("nb")), "b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("common"), col("jaccard"))
  }

  /** MinHash band signatures: for each band, the minimum md5 of
    * band-salted shingles — an 8-band, 1-row signature matrix.
    * Input: (id, shingle) distinct.
    */
  def minhashSignatures(sd: DataFrame, idCol: String, bands: Int): DataFrame =
    sd.withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .groupBy(col(idCol), col("band"))
      .agg(min(md5(concat(col("band").cast("string"), lit(":"), col("shingle"))))
        .as("sig"))

  /** MinHash+LSH near-dup pairs: bucket-join on (band, sig), then verify
    * candidates with exact Jaccard. The LSH stage is the 100 TB path: a
    * shuffle on the bucket key replaces the all-pairs comparison.
    */
  def minhashLshPairs(sd0: DataFrame, idCol: String, bands: Int,
                      minJaccard: Double): DataFrame = {
    // The shingle table feeds five plan branches (signatures, both verify
    // sides, counts); cache it once instead of re-deriving the explode +
    // distinct each time.
    val sd = sd0.cache()
    val mh = minhashSignatures(sd, idCol, bands).cache()
    val cand = mh.select(col(idCol).as("a"), col("band"), col("sig"))
      .join(mh.select(col(idCol).as("b"), col("band"), col("sig")),
        Seq("band", "sig"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    jaccardVerify(cand, sd, idCol, minJaccard)
  }

  /** SimHash near-dup pairs: equal-width 16-bit signatures compared by
    * Hamming distance. Input: (id, simhash).
    */
  def simhashPairs(sh: DataFrame, idCol: String, maxHamming: Int): DataFrame =
    sh.select(col(idCol).as("a"), col("simhash").as("sim_a"))
      .crossJoin(sh.select(col(idCol).as("b"), col("simhash").as("sim_b")))
      .filter(col("a") < col("b"))
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
}
