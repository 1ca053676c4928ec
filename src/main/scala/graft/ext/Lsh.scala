package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.SketchFns

/** Shared LSH candidate-generation core: (id, band, bucket) index →
  * candidate id pairs, via ONE shuffle (groupBy band+bucket) and a native
  * map-side intra-bucket pair expansion over each bucket's sorted id
  * list. A self-join on the same keys costs two shuffles plus the join
  * and materializes the probe side twice for the identical output.
  */
private[ext] object Lsh {

  /** Raw per-band candidate pairs (id_a < id_b), NOT deduplicated across
    * bands: a pair colliding in c bands appears c times. Callers with a
    * cheap verifier (e.g. one cosine) should verify first and dedupe the
    * few survivors; callers with an expensive verifier (e.g. shingle-set
    * intersection) should [[dedup]] first so each pair is verified once.
    *
    * A bucket of f co-hashed ids emits f(f-1)/2 pairs — that fan-out is
    * the LSH collision structure itself, not an implementation artifact;
    * mega-buckets mean the banding is too coarse for the corpus (raise
    * band width / run exact dedup upstream for identical items).
    */
  def bucketPairsRaw(banded: DataFrame): DataFrame =
    banded
      .groupBy(col("band"), col("bucket"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(SketchFns.pair_structs(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))

  def dedup(pairs: DataFrame): DataFrame =
    pairs.dropDuplicates("id_a", "id_b")

  /** Distinct candidate pairs across all bands. */
  def bucketPairs(banded: DataFrame): DataFrame =
    dedup(bucketPairsRaw(banded))
}
