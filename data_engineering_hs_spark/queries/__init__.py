"""Named query registry backing __spark_entry__ and bench.py."""

from data_engineering_hs_spark.queries.registry import REGISTRY, Query, register  # noqa: F401


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from data_engineering_hs_spark.queries import (  # noqa: F401
        relational,
        relational2,
        scalars,
        llm,
        streaming_q,
        sql_api,
        model_q,
        advanced,
        tpch_extra,
        tpch_extra2,
        tpch_extra3,
        windows_extra,
        agg_extra,
        cdc_q,
        llm2,
        llm3,
    )
