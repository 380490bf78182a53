package graft.ext

import org.apache.spark.sql.SparkSession

/** Geometry manifest for SERVED stores — the contract that travels WITH
  * the state.
  *
  * Every materialized index in this library (the banded minhash store, the
  * perceptual-fingerprint store, pinned IVF centroids, the prebuilt HNSW
  * frame) bakes construction parameters into its ROWS but, without this,
  * persisted nothing that says WHICH parameters: probing a 16-hash banded
  * store with numHashes=8, or a dHash store with audio prints, just joins
  * on (band, v) and returns near-zero matches — missed duplicates, no
  * error. The sidecar (`_graft_store_meta.json`, the `_graft_manifest.json`
  * convention from [[Layout]]) records the store kind and its geometry
  * fields; `check` fails LOUDLY on any drift, listing every mismatched
  * field, so a wrong-geometry probe is an exception instead of a silent
  * wrong answer.
  *
  * Values are restricted to a conservative token alphabet at write time —
  * the sidecar is engine-portable JSON that round-trips through a
  * five-line parser, and geometry values (ints, family names, tokenizer
  * ids) never need more. */
object StoreMeta {

  /** Sidecar filename, next to the store's data files. */
  val FileName = "_graft_store_meta.json"

  private val TokenRe = "[A-Za-z0-9._:+-]*".r

  private def requireToken(s: String, what: String): Unit =
    require(TokenRe.matches(s),
      s"store-meta $what must match ${TokenRe.regex}: '$s'")

  /** Write the sidecar (overwrites — geometry is immutable for a store's
    * lifetime, so a rewrite only ever restates the same contract). */
  def write(spark: SparkSession, dir: String, kind: String,
            fields: Map[String, String]): Unit = {
    requireToken(kind, "kind")
    fields.foreach { case (k, v) =>
      requireToken(k, "field name"); requireToken(v, s"field '$k' value")
    }
    val json = fields.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"$v"""" }
      .mkString(s"""{"kind":"$kind","fields":{""", ",", "}}")
    val p = new org.apache.hadoop.fs.Path(dir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Read the sidecar: Some((kind, fields)) or None when absent (a legacy
    * store written before the convention). */
  def read(spark: SparkSession, dir: String)
      : Option[(String, Map[String, String])] = {
    val p = new org.apache.hadoop.fs.Path(dir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val json =
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    // token-alphabet values by construction: every "k":"v" pair is literal
    val pairs = "\"([A-Za-z0-9._:+-]*)\"\\s*:\\s*\"([A-Za-z0-9._:+-]*)\"".r
      .findAllMatchIn(json).map(m => m.group(1) -> m.group(2)).toSeq
    val kind = pairs.collectFirst { case ("kind", v) => v }
      .getOrElse(sys.error(s"malformed $FileName under $dir: $json"))
    Some((kind, pairs.filterNot(_._1 == "kind").toMap))
  }

  /** Verify a store's sidecar against the geometry a probe is about to
    * assume. Throws with the FULL field diff on any drift; a missing
    * sidecar is also loud (probing unknown geometry is the silent-miss
    * hole this exists to close — re-write the store with its `*Write`/
    * `*Save` API, or `write` the sidecar by hand for a legacy store). */
  def check(spark: SparkSession, dir: String, kind: String,
            expected: Map[String, String]): Unit = {
    val (gotKind, got) = read(spark, dir).getOrElse(sys.error(
      s"no $FileName under $dir — cannot verify probe geometry; " +
        s"expected kind=$kind ${fmt(expected)}. Write the store with its " +
        "meta-writing API (or StoreMeta.write a sidecar for legacy state)."))
    require(gotKind == kind,
      s"store kind mismatch under $dir: store is '$gotKind', probe " +
        s"expects '$kind'")
    val drifted = expected.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      got.get(k) match {
        case Some(`v`) => None
        case Some(other) => Some(s"$k: store=$other probe=$v")
        case None => Some(s"$k: store=<absent> probe=$v")
      }
    }
    require(drifted.isEmpty,
      s"store geometry mismatch under $dir (kind=$kind) — probing with " +
        s"drifted parameters returns silently near-empty matches, refusing: " +
        drifted.mkString("; "))
  }

  private def fmt(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("{", ", ", "}")
}
