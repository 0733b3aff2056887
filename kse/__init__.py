"""kse — a PySpark-native analytics engine (see README.md / SURVEY.md).

Public surface for a user switching from the reference pipeline:

    from kse import get_session, load, register_views, queries, oracle_sql

    spark = get_session()
    df = queries()["q_agg_groupby"](spark, "/data/sf0.1")

Streaming: ``kse.streaming.pipeline.run_offline`` (file → window → index)
or the Kafka/ES-parameterized equivalents in ``kse/streaming`` +
``kse/sinks``.
"""

from kse.catalog import SCHEMAS, TABLES, load, register_views
from kse.registry import all_queries, oracle_sql, queries
from kse.session import get_session

__all__ = [
    "SCHEMAS",
    "TABLES",
    "all_queries",
    "get_session",
    "load",
    "oracle_sql",
    "queries",
    "register_views",
]
