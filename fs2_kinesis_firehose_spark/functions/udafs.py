"""Grouped pandas UDAFs (Arrow-batched aggregate UDFs).

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers the
UDF eval type from *runtime* annotations, and PEP-563 stringization breaks
that inference.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean(v: pd.Series) -> float:
    """Geometric mean: exp(mean(log(x))), accumulated in float64."""
    import numpy as np

    return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))
