"""PySpark-native inverted-index + BM25 top-k engine.

A from-scratch replacement for the Elasticsearch indexing/query layer of
the reference ETL pipeline (`wenweih/bitcoin-ledger-2es`), re-expressed
Spark-first over Iceberg-shaped transcript tables. See SURVEY.md for the
capability map. The reference mount is empty in this sandbox (SURVEY.md
§0), so parity targets are cited to BASELINE.json and public
Elasticsearch/Lucene + IR-literature semantics rather than file:line.
"""

from .config import DEFAULT, EngineConfig
from .oracle import PandasOracle
from .plans.build import IndexFrames, build_index, read_index, write_index
from .functions.rank_eval import rank_eval
from .plans.eql import eql_sample, eql_sequence
from .plans.esql import esql
from .plans.multi import MultiSearcher
from .plans.query import (
    BM25Searcher,
    combined_fields,
    linear_fuse,
    multi_match,
    rrf_fuse,
    runtime_search,
)
from .plans.snapshot import (
    lifecycle_tick,
    open_alias,
    put_alias,
    put_alias_multi,
    restore_snapshot,
    rollover,
    snapshot_index,
    verify_snapshot,
)

__all__ = [
    "snapshot_index",
    "verify_snapshot",
    "restore_snapshot",
    "put_alias",
    "put_alias_multi",
    "open_alias",
    "rollover",
    "lifecycle_tick",
    "MultiSearcher",
    "eql_sequence",
    "eql_sample",
    "esql",
    "rrf_fuse",
    "runtime_search",
    "linear_fuse",
    "DEFAULT",
    "EngineConfig",
    "PandasOracle",
    "IndexFrames",
    "build_index",
    "read_index",
    "write_index",
    "BM25Searcher",
    "multi_match",
    "combined_fields",
    "rank_eval",
]
