package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MongoDB CHANGE-STREAM wire-format decoder — the reference's R2
  * ingestion path (SURVEY.md §2.1) with only the transport stubbed.
  *
  * A zero-egress build cannot open a `$changeStream` cursor (no MongoDB
  * driver, no network — the seam documented at graft.cube.Cube), but the
  * change-event DOCUMENT FORMAT is public and stable (MongoDB manual,
  * "Change Events": operationType, fullDocument, documentKey,
  * fullDocumentBeforeChange under `changeStreamPreAndPostImages`), so
  * everything AFTER the socket is implemented for real here: raw change-
  * event JSON → the cube engine's signed-delta frame (+1 insert, −1
  * delete, −old/+new update — graft.cube.CubeManager.applyDeltas'
  * contract), for both batch folds (CubeService.updateAggregates) and
  * micro-batch maintenance (a JSON-lines directory stands in for the
  * cursor; resume/replay ride the file-source checkpoint exactly as the
  * cursor's resume token would).
  *
  * Delete/update correctness hinges on PRE-IMAGES: a cube fold needs the
  * deleted/overwritten row's dimension and measure VALUES, and a bare
  * `documentKey._id` cannot provide them without an id→row index scaled
  * to the source (which is the thing a cube exists to avoid). MongoDB
  * 6.0+ publishes `fullDocumentBeforeChange` when the collection enables
  * `changeStreamPreAndPostImages` — this decoder REQUIRES that: a
  * delete/update event arriving without its pre-image fails the fold
  * loudly (a codegen'd `raise_error` per offending row — distributed, no
  * driver-side scan) instead of silently under-counting. `insert` takes
  * the post-image only; `replace` is a full overwrite = −before/+after,
  * same as update; drop/rename/invalidate carry no row data and are
  * filtered out.
  */
object MongoChangeStream {
  /** Change-event envelope over a collection's document schema. Extra
    * fields in the raw JSON (resume token `_id`, `clusterTime`, `ns`,
    * `updateDescription`, …) are ignored by `from_json`'s permissive
    * mode — decoding keys only on the fields the fold needs. */
  def eventSchema(docSchema: StructType): StructType = StructType(Seq(
    StructField("operationType", StringType),
    StructField("fullDocument", docSchema),
    StructField("fullDocumentBeforeChange", docSchema)))

  private val RowOps = Seq("insert", "replace", "update", "delete")

  /** Decode a frame of raw change-event JSON strings (column `value` —
    * the shape of `spark.read.text` / `readStream.text`) into the
    * signed-delta frame for `docSchema`: document columns + `_sign`. */
  def decode(raw: DataFrame, docSchema: StructType): DataFrame = {
    val e = raw.select(
        from_json(col("value"), eventSchema(docSchema)).as("e"))
      .filter(col("e.operationType").isin(RowOps: _*))
    val needsPre = col("e.operationType").isin("update", "replace", "delete")
    val needsPost = col("e.operationType").isin("insert", "update", "replace")
    // loud failure beats silent under-count: the guard wraps the struct
    // the output columns are read FROM, so it can't be pruned away and
    // evaluates row-side, inside codegen. The raise condition REPEATS
    // the branch's operationType predicate: a downstream join/anti-join
    // on a document column (the dictionary-bitmap fold does this)
    // pushes isnotnull(<col>) into the branch, and Catalyst may order
    // the pushed conjunct BEFORE the branch filter — evaluating the
    // guard on rows the filter would have excluded. With the op-type
    // conjunct inside the when(), such rows fall to the (null) branch
    // and are dropped by the very predicate that got pushed; genuinely
    // missing images still raise.
    val pre = e.filter(needsPre)
      .select(when(needsPre && col("e.fullDocumentBeforeChange").isNull,
          raise_error(concat(lit("MongoChangeStream: "),
            col("e.operationType"),
            lit(" event without fullDocumentBeforeChange — enable " +
              "changeStreamPreAndPostImages on the collection"))))
        .otherwise(col("e.fullDocumentBeforeChange")).as("d"))
      .select(col("d.*"))
      .withColumn("_sign", lit(-1))
    val post = e.filter(needsPost)
      .select(when(needsPost && col("e.fullDocument").isNull,
          raise_error(concat(lit("MongoChangeStream: "),
            col("e.operationType"),
            lit(" event without fullDocument"))))
        .otherwise(col("e.fullDocument")).as("d"))
      .select(col("d.*"))
      .withColumn("_sign", lit(1))
    post.unionByName(pre)
  }

  /** File-transport stand-in for the cursor: a streaming signed-delta
    * frame over a directory of change-event JSON lines. Feed to
    * `foreachBatch { (b, _) => CubeService.updateAggregates(name, b) }`
    * for maintained cubes; the file-source checkpoint provides the
    * resume semantics the cursor's resume token would. */
  def stream(spark: SparkSession, dir: String,
      docSchema: StructType): DataFrame =
    decode(spark.readStream.text(dir), docSchema)

  /** NETWORK transport — the cursor seam implemented as far as a
    * zero-egress box physically allows: a live TCP tail of newline-
    * delimited change-event JSON, decoded by the same [[decode]] the
    * file replay uses. `mongosh` can produce exactly this feed
    * (`watch()` piped through a socket), so against a real deployment
    * this IS the live path; on this box a loopback server stands in for
    * the remote end (MongoChangeStreamSpec pins live-tail ==
    * file-replay on identical event bytes).
    *
    * Socket-source caveat, deliberate: Spark's socket reader keeps no
    * offset log, so a restart re-tails from wherever the server is —
    * exactly a cursor WITHOUT a resume token. Durable resume is the
    * file transport's job ([[stream]] + checkpoint); production shape
    * is socket tail → raw-event archive dir → [[stream]], giving live
    * latency AND replayable history from the same decode path. */
  def socketStream(spark: SparkSession, host: String, port: Int,
      docSchema: StructType): DataFrame =
    decode(spark.readStream.format("socket")
      .option("host", host).option("port", port).load(), docSchema)
}
