"""avro_diff_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference Avro diff tool (yuana97/Avro_Diff),
re-expressed Spark-first, plus LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.

Everything is lazy DataFrame construction: operators take and return
DataFrames, ``collect()`` happens only at the CLI/print boundary, and the
physical strategy (join choice, shuffle layout, pushdown) is left to
Catalyst/AQE so plans survive a 1000-executor scale-up unchanged.
"""

from avro_diff_spark.session import get_spark
from avro_diff_spark.sources.avro import project_fields, read_avro
from avro_diff_spark.sources.tables import load_table, load_tables
from avro_diff_spark.operators.key_diff import key_diff, key_diff_detail
from avro_diff_spark.operators.venn_diff import venn_counts, venn_diff, venn_summary
from avro_diff_spark.operators.collisions import key_collisions
from avro_diff_spark.operators.asof import asof_join

__all__ = [
    "get_spark",
    "project_fields",
    "read_avro",
    "load_table",
    "load_tables",
    "key_diff",
    "key_diff_detail",
    "venn_counts",
    "venn_diff",
    "venn_summary",
    "key_collisions",
    "asof_join",
]

__version__ = "0.1.0"
