"""Query-plan registry package.

Importing this package imports every operator module, which registers its
queries (and oracle SQL twins) into :mod:`.registry`.
"""

from projet_pipeline_bigdata_org_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_oracles,
    all_queries,
    get,
    query,
)


def load_all() -> None:
    """Import every module that registers queries."""
    # imports are for their registration side effects
    from projet_pipeline_bigdata_org_spark.operators import (  # noqa: F401
        analytics_ext,
        clustering,
        curation,
        dataquality,
        dedup,
        grouped,
        multimodal,
        outliers,
        packing,
        relational,
        relational_ext,
        similarity,
        textops,
        timeseries,
        tpch_suite,
        udtf_ext,
    )
    from projet_pipeline_bigdata_org_spark import pipeline  # noqa: F401
    from projet_pipeline_bigdata_org_spark.ml import pipeline as ml_pipeline  # noqa: F401
    from projet_pipeline_bigdata_org_spark.streaming import windows  # noqa: F401
