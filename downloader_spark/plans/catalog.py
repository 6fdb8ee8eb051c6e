"""Side-effect import hub: every module that registers query keys.

Importing this module populates the registry (plans.registry).  Add a
line per operator module as coverage widens.
"""

import downloader_spark.operators.aggregates  # noqa: F401
import downloader_spark.operators.analytics_ext  # noqa: F401
import downloader_spark.operators.analytics_series  # noqa: F401
import downloader_spark.operators.corpus_hygiene  # noqa: F401
import downloader_spark.operators.extended  # noqa: F401
import downloader_spark.operators.graph_ops  # noqa: F401
import downloader_spark.operators.layout_cdc  # noqa: F401
import downloader_spark.operators.llm_dedup  # noqa: F401
import downloader_spark.operators.llm_similarity  # noqa: F401
import downloader_spark.operators.llm_text  # noqa: F401
import downloader_spark.operators.mining_stats  # noqa: F401
import downloader_spark.operators.multimodal_scan  # noqa: F401
import downloader_spark.operators.network  # noqa: F401
import downloader_spark.operators.olap_shapes  # noqa: F401
import downloader_spark.operators.pipeline_ext  # noqa: F401
import downloader_spark.operators.reference_core  # noqa: F401
import downloader_spark.operators.relational  # noqa: F401
import downloader_spark.operators.retrieval_rank  # noqa: F401
import downloader_spark.operators.scalars  # noqa: F401
import downloader_spark.operators.sql_surface  # noqa: F401
import downloader_spark.operators.streaming_windows  # noqa: F401
import downloader_spark.operators.training_prep  # noqa: F401
import downloader_spark.operators.udfs  # noqa: F401
import downloader_spark.operators.windows  # noqa: F401
# ORDERING RULE (single source of truth — round modules below are
# APPEND-ONLY, newest round module LAST): the driver confirms a
# 50-key prefix per round ordered never-confirmed-first then
# registry order (__spark_entry__.py), so keys registered after
# every earlier module never delay confirmation of the existing
# backlog.  When adding a round module, append its import here and
# do NOT reorder the lines above it.
import downloader_spark.operators.round6_ext  # noqa: F401,E402
import downloader_spark.operators.round7_ext  # noqa: F401,E402
import downloader_spark.operators.round9_ext  # noqa: F401,E402
import downloader_spark.operators.round9b_ext  # noqa: F401,E402
import downloader_spark.operators.round10_ext  # noqa: F401,E402
import downloader_spark.operators.round11_ext  # noqa: F401,E402
import downloader_spark.operators.round12_ext  # noqa: F401,E402
import downloader_spark.operators.round13_ext  # noqa: F401,E402
import downloader_spark.operators.round13b_ext  # noqa: F401,E402
import downloader_spark.operators.round14_ext  # noqa: F401,E402
import downloader_spark.operators.round15_ext  # noqa: F401,E402
import downloader_spark.operators.round16_ext  # noqa: F401,E402
