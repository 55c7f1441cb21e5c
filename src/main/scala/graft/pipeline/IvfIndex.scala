package graft.pipeline

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index over an `Array[Float]` embedding column
  * — the k-means-quantized alternative to sign-LSH bucketing
  * (SURVEY.md §2.9 "IVF or LSH-bucketed variant as the scale path").
  *
  * Build: train a coarse quantizer (k-means with a fixed seed) on a
  * sample, assign every vector to its nearest centroid (= its inverted
  * list). At 100 TB the table is written `partitionBy("ivf_cell")`, so a
  * probe scans only `nprobe` cells' files — partition pruning does the
  * index lookup.
  *
  * Query: score the probe against the centroids driver-side (k ≪ 10⁴ —
  * this is metadata, not data), pick the `nprobe` nearest cells, then
  * exact-cosine only within those cells.
  */
object IvfIndex {

  case class Model(centroids: Array[Array[Double]], kmeans: org.apache.spark.ml.clustering.KMeansModel)

  /** Train the coarse quantizer. Deterministic via fixed seed. */
  def build(table: DataFrame, k: Int, seed: Long = 42L,
            sampleFraction: Double = 1.0): Model = {
    val train0 = if (sampleFraction >= 1.0) table else
      table.sample(withReplacement = false, sampleFraction, seed)
    val train = train0.select(array_to_vector(
      transform(col("embedding"), x => x.cast("double"))).as("features"))
    val km = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features")
    val model = km.fit(train)
    Model(model.clusterCenters.map(_.toArray), model)
  }

  /** Assign every row to its inverted list (nearest centroid). */
  def assign(table: DataFrame, model: Model): DataFrame = {
    val withFeatures = table.withColumn("features",
      array_to_vector(transform(col("embedding"), x => x.cast("double"))))
    model.kmeans.setPredictionCol("ivf_cell").transform(withFeatures)
      .drop("features")
  }

  /** Top-k by exact cosine, scanning only the nprobe nearest cells. */
  def topK(assigned: DataFrame, model: Model, probe: Array[Float], k: Int,
           nprobe: Int, idCol: String = "vec_id"): DataFrame = {
    val p = probe.map(_.toDouble)
    def dist2(c: Array[Double]): Double =
      c.zip(p).map { case (a, b) => (a - b) * (a - b) }.sum
    // centroid ranking is k-sized driver metadata, not a data scan
    val cells = model.centroids.zipWithIndex
      .sortBy { case (c, _) => dist2(c) }
      .take(nprobe).map(_._2)
    val spark = assigned.sparkSession
    val probeDf = {
      import spark.implicits._
      Seq(Tuple1(probe)).toDF("__probe")
    }
    assigned
      .filter(col("ivf_cell").isin(cells.map(Integer.valueOf): _*))
      .crossJoin(broadcast(probeDf))
      .withColumn("cos",
        graft.functions.GraftFunctions.vectorCosine(col("embedding"), col("__probe")))
      .filter(!isnan(col("cos"))) // zero-norm vectors sort above real hits otherwise
      .select(col(idCol), col("cos"), col("ivf_cell"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }
}
