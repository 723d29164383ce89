"""Scalar column-expression library (SURVEY §2.3).

Every function returns a Spark ``Column`` built from built-in
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen friendly.
No Python UDFs live here; the UDF escape hatch is
``calorista_spark.operators`` (L6) and is used only where built-ins
genuinely cannot express the semantics.
"""

from calorista_spark.functions.dates import (  # noqa: F401
    date_to_epoch_days,
    days_in_month,
    epoch_days_to_date,
    iso_week,
    iso_year,
    month_label,
    month_start,
    today_in_tz,
)
from calorista_spark.functions.numeric import coerce_double, share_pct  # noqa: F401
from calorista_spark.functions.text import (  # noqa: F401
    fingerprint,
    fingerprint_hash,
    key_date,
    pretty_measure_name,
    row_hash,
)
from calorista_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
