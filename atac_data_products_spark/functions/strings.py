"""String/scalar expression library (SURVEY.md §2.3).

Every reference scalar transform was an eager Python function over pandas
(e.g. barcode prefix strip at bin/concatenate.py:67, laterality strip at
bin/concatenate.py:28, cell-id concat at bin/concatenate.py:71-76).  Here
each one is a *Column expression* — JVM-side, codegen-friendly, no Python
in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def replace_literal(col: Column | str, find: str, replacement: str = "") -> Column:
    """Literal (non-regex) substring replacement.

    Reference: strips the ``"BAM_data#"`` barcode prefix
    (bin/concatenate.py:67).  `F.replace` is the literal-semantics builtin
    (no regex-escaping pitfalls).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(c, F.lit(find), F.lit(replacement))


def strip_laterality(col: Column | str) -> Column:
    """Remove a trailing ``" (Left)"`` / ``" (Right)"`` qualifier.

    Reference: organ-name cleanup at bin/concatenate.py:28.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r" \((Left|Right)\)$", "")


def concat_cell_id(dataset: Column | str, barcode: Column | str) -> Column:
    """``cell_id = dataset + "-" + barcode`` (bin/concatenate.py:71-76).

    The reference loops over the pandas index building f-strings; here it
    is one vectorized `concat_ws`.
    """
    d = F.col(dataset) if isinstance(dataset, str) else dataset
    b = F.col(barcode) if isinstance(barcode, str) else barcode
    return F.concat_ws("-", d, b)
