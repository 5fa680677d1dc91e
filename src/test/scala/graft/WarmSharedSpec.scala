package graft

/** The warm-shared dedup frames ([[graft.operators.Dedup.warmShared]] — the
  * Verify/Bench standing-artifact path) must be a pure optimization: every
  * sharing query's output is byte-identical warm vs cold. This is the spec
  * behind the "semantics-free" claim the harnesses rely on; every OTHER
  * suite runs cold (no warm call), so plan pins and determinism flips keep
  * exercising the full self-contained pipeline.
  */
class WarmSharedSpec extends SparkSpec {
  test("warm standing frames change no sharing query's output") {
    val names = graft.operators.Dedup.sharedFamily.toSeq.sorted
    val cold = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq).toMap
    val keep = graft.operators.Dedup.warmShared(spark, sf)
    try {
      assert(keep.nonEmpty, "warmShared registered no checkpointed frames")
      names.foreach { n =>
        val w = SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq
        assert(w === cold(n), s"$n diverges under the warm standing frames")
      }
    } finally graft.operators.Dedup.clearWarm()
  }

  test("warm IVF frames change no sharing query's output") {
    val names = graft.operators.Similarity.sharedFamily.toSeq.sorted
    val cold = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq).toMap
    val keep = graft.operators.Similarity.warmShared(spark, sf)
    try {
      assert(keep.nonEmpty, "warmShared registered no checkpointed frames")
      names.foreach { n =>
        val w = SparkEntry.queries(n)(spark, sf).collect().map(_.toString).toSeq
        assert(w === cold(n), s"$n diverges under the warm IVF frames")
      }
    } finally graft.operators.Similarity.clearWarm()
  }
}
