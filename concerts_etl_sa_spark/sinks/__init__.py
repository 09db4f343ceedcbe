from .writers import (  # noqa: F401
    append_historized,
    export_csv,
    export_json_preview,
    overwrite_snapshot,
    union_heterogeneous,
)
