from .hashes import hash59, minhash_columns  # noqa: F401
from .strings import (  # noqa: F401
    concat_cell_id,
    replace_literal,
    strip_laterality,
)
