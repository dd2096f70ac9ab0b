package graft.model

import java.sql.Timestamp

/** Core record contracts of the engine.
  *
  * Mirrors the reference's canonical contracts
  * (`src/deid_pipeline/core/contracts.py:18-78`,
  * `src/deid_pipeline/pii/utils/base.py:21-28`) re-expressed as Spark-encodable
  * case classes. All span offsets are **Unicode code-point** offsets into the
  * turn text (Python string-index semantics), not UTF-16 offsets.
  */

/** One conversation turn — the input row (BASELINE.json `input_hint`). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

/** Detector-level minimal entity (`pii/utils/base.py:21-28`). */
final case class SpanEnt(
    start: Int,
    end: Int,
    typ: String,
    score: Double,
    source: String
)

/** Canonical normalized entity (`core/contracts.py:18-43` via
  * `normalize_entity` `:81-134`). `confidence` == `score` (dual-write).
  */
final case class Entity(
    typ: String,
    confidence: Double,
    score: Double,
    source: String,
    language: String,
    start: Int,
    end: Int,
    text: String
)

/** Replacement audit event (`core/contracts.py:46-54`; populated at
  * `__init__.py:98-117`). Span is `(start, start + len(replacement))` in the
  * coordinates current at splice time (`pii/utils/replacer.py:70-81`).
  */
final case class DeidEvent(
    entity_type: String,
    original: String,
    replacement: String,
    start: Int,
    end: Int,
    source: String
)

/** One output row per turn — the Spark shape of `DeidResult`
  * (`core/contracts.py:57-78`). `replacement_map` keys are
  * `"TYPE:original"` (`core/contracts.py:137-140`).
  */
final case class RedactedTurn(
    conv_id: String,
    turn_idx: Int,
    text: String,
    entities: Seq[Entity],
    events: Seq[DeidEvent],
    replacement_map: Map[String, String]
)

/** Extracted text segment with structural anchors
  * (`handlers/base.py:13-25`).
  */
final case class Segment(
    segment_id: Int,
    start: Int,
    end: Int,
    text: String,
    page_index: Option[Int] = None,
    bbox: Option[Seq[Int]] = None,
    cell: Option[Map[String, String]] = None
)
