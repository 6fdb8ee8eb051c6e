"""Cross-engine-exact scalar/aggregate helpers."""

from downloader_spark.functions.numeric import (
    dec,
    money_avg,
    money_sum,
    sql_dec,
    sql_money_avg,
    sql_money_sum,
)

__all__ = [
    "dec",
    "money_avg",
    "money_sum",
    "sql_dec",
    "sql_money_avg",
    "sql_money_sum",
]
