from .aggregates import collect_sorted_csv, first_match_pivot  # noqa: F401
from .joins import broadcast_dim_join, intersect_keys, zip_columns  # noqa: F401
from .unions import union_outer  # noqa: F401
from .windows import first_per_group  # noqa: F401
