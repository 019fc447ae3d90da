package graft.projector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** The engine-native event-log envelope (FIXTURES.md §2): one row per event,
  * globally ordered by `seq` — the analogue of the reference's Postgres
  * event store and its total-order replay contract
  * (`/root/reference/OpenFTTH.RelationalProjector/Worker.cs:32,42`,
  * `Startup.cs:92-98`).
  *
  * Envelope columns:
  *   - `seq BIGINT` — unique, ascending global sequence
  *   - `event_type STRING` — one of the 28 type names (the reference's
  *     Newtonsoft `TypeNameHandling.Auto` discriminator, `Startup.cs:44-51`)
  *   - `payload STRING` — JSON body, decoded with an explicit schema via
  *     `from_json` (never schema inference), mirroring the reference's
  *     typed deserialization.
  *
  * The decoded payload is ONE sparse struct (only the branch relevant to
  * the event_type is non-null) so a single pass over the log serves every
  * derivation — column pruning then narrows each derivation's scan to the
  * few fields it touches.
  */
object EventLog {

  /** Shared shape of a utility-network hop list. */
  private val hopsDdl =
    "ARRAY<STRUCT<fromNodeId: STRING, toNodeId: STRING, parentAffixes: ARRAY<STRUCT<spanSegmentId: STRING>>>>"

  /** Full payload schema; field shapes exactly as consumed by the reference
    * (SURVEY.md §1.5). The two `equipment` users (span + terminal
    * placement) are merged into one superset struct.
    */
  val payloadDdl: String =
    s"""specification STRUCT<id: STRING, name: STRING, category: STRING, isCable: BOOLEAN,
       |  outerDiameter: INT, isCustomerTermination: BOOLEAN,
       |  rootTemplate: STRUCT<spanStructureSpecificationId: STRING>>,
       |container STRUCT<id: STRING, routeNodeId: STRING, specificationId: STRING>,
       |nodeContainerId STRING,
       |newSpecificationId STRING,
       |interest STRUCT<id: STRING, routeNetworkElementRefs: ARRAY<STRING>>,
       |interestId STRING,
       |routeNetworkElementIds ARRAY<STRING>,
       |equipment STRUCT<id: STRING, name: STRING, specificationId: STRING,
       |  walkOfInterestId: STRING, isCable: BOOLEAN, nodesOfInterestIds: ARRAY<STRING>,
       |  spanStructures: ARRAY<STRUCT<spanSegments: ARRAY<STRUCT<id: STRING,
       |    fromNodeOfInterestIndex: INT, toNodeOfInterestIndex: INT,
       |    fromTerminalId: STRING, toTerminalId: STRING>>>>,
       |  utilityNetworkHops: $hopsDdl,
       |  addressInfo: STRUCT<accessAddressId: STRING, unitAddressId: STRING>,
       |  nodeContainerId: STRING>,
       |spanEquipmentId STRING,
       |nodesOfInterestIds ARRAY<STRING>,
       |newUtilityHopList $hopsDdl,
       |addressInfo STRUCT<accessAddressId: STRING, unitAddressId: STRING>,
       |terminalEquipmentId STRING,
       |namingInfo STRUCT<name: STRING>,
       |workTaskId STRING,
       |workTask STRUCT<number: STRING, status: STRING>,
       |status STRING,
       |id STRING,
       |installationId STRING,
       |unitAddressId STRING,
       |locationRemark STRING""".stripMargin

  val payloadSchema: StructType =
    DataType.fromDDL(payloadDdl).asInstanceOf[StructType]

  /** The C# `Guid.Empty` sentinel used for "no terminal connected". */
  val EmptyUuid = "00000000-0000-0000-0000-000000000000"

  /** Raw on-disk envelope schema — every reader of the event parquet
    * passes this explicitly (schema inference costs a footer-listing job,
    * and the envelope is a fixed contract, FIXTURES.md §2). */
  val envelopeDdl = "seq BIGINT, event_type STRING, payload STRING"
  val envelopeSchema: StructType =
    DataType.fromDDL(envelopeDdl).asInstanceOf[StructType]

  /** Decode a raw envelope (seq, event_type, payload JSON-string) into
    * (seq, event_type, p STRUCT). */
  def decode(raw: DataFrame): DataFrame =
    raw.withColumn("p", from_json(col("payload"), payloadSchema))
      .select(col("seq"), col("event_type"), col("p"))
}
