package graft

import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal plumbing: schema, determinism, and feature sanity of the
  * partition-batched extractor (decode step stubbed — see Multimodal). */
class MultimodalSpec extends SparkSpec {

  test("withBlob: binary payload + metadata struct") {
    val b = Multimodal.withBlob(Tables.documents(spark, sf0), "text")
    assert(b.schema("payload").dataType.typeName == "binary")
    val meta = b.select("media_meta.mime", "media_meta.n_bytes", "media_meta.digest").head()
    assert(meta.getString(0) == "text/plain")
    assert(meta.getLong(1) > 0)
    assert(meta.getString(2).length == 32)
  }

  test("extractFeatures: deterministic, schema'd, entropy within [0,8]") {
    val blobs = Multimodal.withBlob(Tables.documents(spark, sf0), "text")
    val f1 = Multimodal.extractFeatures(blobs, "doc_id", "payload").orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(blobs, "doc_id", "payload").orderBy("doc_id").collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == Tables.documents(spark, sf0).count())
    assert(f1.forall { r =>
      val e = r.getDouble(3)
      e >= 0.0 && e <= 8.0 && r.getLong(1) > 0 && r.getInt(4) >= 64 && r.getInt(5) >= 64
    })
  }
}
