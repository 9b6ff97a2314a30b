from intuition_spark.analysis.analyzers import (  # noqa: F401
    ANALYZERS,
    analyze_series,
    analyze_text,
    make_analyze_udf,
)
from intuition_spark.analysis.porter import porter_stem  # noqa: F401
from intuition_spark.analysis.stopwords import ENGLISH_STOPWORDS  # noqa: F401
