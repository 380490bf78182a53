package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsofJoin, BloomJoin, Curation, Decontaminate, Dedup, Dsir, Funnel, Graph, Layout, Multimodal, RangeJoin, Resample, Sampling, Similarity, SkewJoin, Sketches, TextStats, Urls}
import graft.streaming.EventTimeOps

/** Extension-operator catalog (SURVEY §2.8 + coverage breadth): dedup,
  * similarity search, text analysis, multimodal plumbing, streaming-window
  * shape, CSV round-trip, and SQL-surface breadth queries — each with a
  * DuckDB oracle that reproduces the Spark result bit-for-bit.
  *
  * Cross-engine portability rules on top of [[Queries]]' rules:
  *  - hashes are md5-derived (md5 is engine-independent); minhash minimizes
  *    the md5 *string* so no integer overflow semantics are involved;
  *  - float vector math happens in double after an exact float→double cast,
  *    as a strict left fold in index order (fp addition isn't associative —
  *    identical order ⟹ identical bits);
  *  - ratio metrics are single divisions of exact integers;
  *  - rolling hashes are mod 1e9+7 so every intermediate fits well under
  *    2^63 in any engine.
  */
object ExtQueries {

  /** Every extension-operator catalog entry, composed from the per-family
    * catalog objects (split from the former single-file map with zero
    * behavior change — same keys, same definitions). */
  val all: Map[String, (SparkSession, String) => DataFrame] =
    DedupCatalog.queries ++
    SimilarityCatalog.queries ++
    SamplingCatalog.queries ++
    TextCatalog.queries ++
    MultimodalCatalog.queries ++
    BreadthCatalog.queries

  /** DuckDB oracle SQL per catalog key, composed the same way. */
  val oracle: Map[String, String] =
    DedupCatalog.oracle ++
    SimilarityCatalog.oracle ++
    SamplingCatalog.oracle ++
    TextCatalog.oracle ++
    MultimodalCatalog.oracle ++
    BreadthCatalog.oracle
}
