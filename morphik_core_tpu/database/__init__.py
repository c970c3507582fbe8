from morphik_core_tpu.database.metadata_filters import (  # noqa: F401
    InvalidMetadataFilterError,
    matches_filter,
)
from morphik_core_tpu.database.sqlite_database import SQLiteDatabase  # noqa: F401
