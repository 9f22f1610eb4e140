"""Round-13 bank (staged): loaded by ``registry._load_deferred()``, NOT
``_load_all`` — the round-12 driver window is exactly full with the
pipeline16/17/18 tranches plus this round's single in-window query, so
new operators registered here stay out of the driver-facing registry
until the round-13 window opens, while the registry-wide lint and parity
tests load this module explicitly and enforce the full plan/determinism
discipline from day one.

Reference provenance: like pipeline7-18, none of these operators exist in
the reference's Go core (a MongoDB change-stream -> NATS connector,
/root/reference/internal/mongo/client.go) — they extend the engine-side
analytics surface documented in SURVEY.md §2.3/§2.4 downstream of the
connector's change streams.

Cross-engine determinism rules (the pipeline11-18 discipline):
- exact integers end-to-end on the hash surface; cumulative masses over
  value DOMAINS (never row-proportional rank windows);
- any total that can cross 2^53 stays DECIMAL(38,0)/HUGEINT and
  floor-divides (`div` / ``//``) to a sub-2^53 integer before the ONE
  double conversion;
- integer `div` (Spark) and `//` (DuckDB) BOTH truncate toward zero on
  negatives (only Python's // floors), so signed divisions match across
  engines;
- no exp/ln/pow/round-of-float anywhere on the hash surface; +,-,*,/,
  sqrt are IEEE-correctly-rounded and bit-portable in fixed operand
  order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_nats_connector_spark.registry import register
from mongodb_nats_connector_spark.sources.tables import table

__all__: list[str] = []
