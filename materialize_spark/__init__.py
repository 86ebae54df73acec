"""materialize_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of MaterializeInc/materialize.

Architecture (see SURVEY.md for the full blueprint):

- **Batch SQL surface**: Spark SQL / DataFrame API does the heavy lifting;
  Catalyst supplies ~90% of the reference's optimizer (predicate pushdown,
  column pruning, join reordering, constant folding — SURVEY.md §4.2).
- **Relational operators** (`operators/`): the 16-variant MIR algebra of the
  reference (reference: src/expr/src/relation.rs:99-309) re-expressed as
  DataFrame combinators — TopK, DISTINCT ON, set ops with multiplicities
  (Negate/Threshold), LetRec fixpoint, table functions.
- **Scalar/aggregate functions** (`functions/`): PostgreSQL-dialect function
  surface (reference: src/sql/src/func.rs) mapped onto pyspark.sql.functions.
- **Sources/sinks** (`sources/`): parquet/csv/json/kafka readers with
  envelope handling (reference: src/storage-types/src/sources.rs).
- **Streaming IVM** (`streaming/`): materialized-view maintenance via
  Structured Streaming + foreachBatch merge; upsert envelope; temporal
  filters (reference: src/compute/src/sink/materialized_view.rs,
  src/storage/src/upsert.rs).
- **Pipeline extensions** (`pipeline/`): large-scale training-data ops —
  dedup (exact/minhash/simhash), similarity search, text analysis,
  multimodal plumbing. No reference analog; Spark-native.

Designed for 100 TB on a 1000-executor cluster; tested on local[32].
"""

__version__ = "0.1.0"

from materialize_spark.session import get_spark
from materialize_spark.catalog import Catalog, load_tables

__all__ = ["get_spark", "Catalog", "load_tables", "__version__"]
